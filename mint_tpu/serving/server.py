"""Batched HTTP inference server for dance generation.

The reference has no serving story (generation is an offline eval loop);
this provides a production path: a micro-batching queue in front of the
compiled ``lax.scan`` decoder, so concurrent requests ride one TPU
dispatch.

Protocol (npy bodies keep it dependency-free):

- ``POST /generate?steps=N`` — body is one ``.npy`` payload of audio
  features [T_audio, 35] (float32), optionally followed by a second
  concatenated ``.npy`` blob holding the seed motion
  [motion_seq, motion_dim].  Response: ``.npy`` of generated motion
  [steps', motion_dim] where steps' = min(N, T_audio - audio_seq + 1).
- ``GET /healthz`` — liveness + model info.
- ``GET /stats`` — request/batch counters.

Batching: requests wait up to ``batch_window_ms`` (or until
``max_batch``), are bucketed by generatable length, padded to the
bucket's longest audio, and decoded in one batched scan per bucket.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from mint_tpu.infer import decoder
from mint_tpu.models.fact import FACT

log = logging.getLogger(__name__)


class _Request:
    def __init__(self, audio: np.ndarray, seed: Optional[np.ndarray],
                 steps: int):
        self.audio = audio
        self.seed = seed
        self.steps = steps
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None
        # True when `error` is a SERVICE fault (worker death), not a bad
        # request: generate() raises RuntimeError (HTTP 500), never the
        # ValueError (400) reserved for client errors.
        self.fatal = False
        # PADDED batch size of the dispatch this request rode in
        # (stamped by the worker on success; 0 = never dispatched).
        # Warmup reads it to VERIFY its burst warmed the intended
        # bucket — a global-counter delta would misread concurrent
        # live-traffic dispatches as a split burst.
        self.cobatch = 0


class GenerationService:
    """Owns the model, params, and the batching worker."""

    def __init__(self, model: FACT, params, batch_window_ms: float = 10.0,
                 max_batch: int = 8, default_steps: int = 1200,
                 steps_bucket: int = 128, unroll: int = 8,
                 request_timeout: float = 900.0, mesh=None):
        """`steps_bucket` quantizes generation lengths upward so XLA
        compiles one decoder per (batch-bucket, steps-bucket) instead of
        one per distinct client audio length; extra frames use zero
        audio padding and are trimmed before returning (exact: frame i
        only reads audio [i, i+window), which is fully real for i <
        requested steps).

        `unroll` is the decode-scan unroll factor: 8 maximizes warm
        throughput (+11%, docs/BENCHMARKS.md); drop to 1 when per-bucket
        cold-compile latency matters more than steady-state throughput.

        `max_batch` default 8: per-frame decode throughput FALLS with
        batch on this chip, steeply at the f32 serving default (batch 8
        = 1683 f/s vs batch 32 = 1180, full-protocol sweep — docs/
        BENCHMARKS.md "f32 scoring decode BATCH sweep"), so closing a
        32-deep burst into four batch-8 dispatches is both ~40% more
        throughput AND lower worst-case latency than one batch-32
        dispatch.  bf16 deployments can raise it (the bf16 curve is
        flat to ~20).

        `mesh` (optional jax.sharding.Mesh) shards each decode batch over
        the mesh's data axis — one server drives the whole chip pod the
        way the Evaluator's sharded decode does.  Batches are padded to a
        data-axis multiple and trimmed per request; same protocol math as
        single-device serving (per-row computation is batch-independent;
        sharding only changes XLA fusion order, tested at 2e-5)."""
        from mint_tpu.utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()  # warm restarts reuse bucket compiles
        # NOT LN-affine-folded: the fold (mint_tpu/models/fold.py) is
        # exact but measured 5% SLOWER end-to-end on TPU v5e — the folded
        # program's new QKV bias/schedule costs more than the affine it
        # removes (docs/BENCHMARKS.md, round-3 ablations).
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # Checkpoint restores return single-device-committed arrays;
            # replicate over the mesh once at boot (mesh_lib docs).
            from mint_tpu.parallel import mesh as mesh_lib
            params = mesh_lib.replicate_params(params, mesh)
        self.params = params
        self.batch_window = batch_window_ms / 1000.0
        self.max_batch = max_batch
        self.default_steps = default_steps
        self.steps_bucket = max(1, steps_bucket)
        self.unroll = unroll
        self.request_timeout = request_timeout
        self.motion_dim = (
            model.config.cross_modal_model.output_layer.out_dim)
        # Audio width comes from the config (the AIST++ frontend's 35
        # when unset) — request validation must use the same rule the
        # decode program is built with, not a hardcoded 35.
        self.audio_dim = (
            model.config.modality_by_name("audio").feature_dim or 35)
        self.stats = {"requests": 0, "batches": 0, "generated_frames": 0}
        self._stats_lock = threading.Lock()
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._fatal: Optional[str] = None
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _bump(self, key: str, amount: int = 1) -> None:
        with self._stats_lock:  # += is not atomic across handler threads
            self.stats[key] += amount

    def stats_snapshot(self) -> dict:
        """Mutually-consistent copy of the counters (taken under the lock)."""
        with self._stats_lock:
            return dict(self.stats)

    # -- client side -----------------------------------------------------

    def generate(self, audio: np.ndarray, seed: Optional[np.ndarray] = None,
                 steps: Optional[int] = None,
                 timeout: Optional[float] = None) -> np.ndarray:
        if timeout is None:
            # First-compile of a new length bucket can take minutes on a
            # slow-compile host; the flag/server owner sets the budget.
            timeout = self.request_timeout
        # Validate per-request so one bad request cannot fail the bucket
        # it would have been co-batched with.  Audio belongs here too,
        # not only in the HTTP layer: a direct API caller's 1-D or
        # wrong-width audio would otherwise blow up inside the worker's
        # per-bucket batch and 400 every co-batched request.
        motion_seq = self.model.motion_seq_length
        audio = np.asarray(audio, np.float32)
        if audio.ndim != 2 or audio.shape[1] != self.audio_dim:
            raise ValueError(
                f"audio features must be [T, {self.audio_dim}], got "
                f"{list(audio.shape)}")
        if seed is not None:
            seed = np.asarray(seed, np.float32)
            if seed.shape != (motion_seq, self.motion_dim):
                raise ValueError(
                    f"seed motion must be [{motion_seq}, "
                    f"{self.motion_dim}], got {list(seed.shape)}")
        if self._fatal:
            raise RuntimeError(self._fatal)
        req = _Request(audio, seed, steps or self.default_steps)
        self._bump("requests")
        self._q.put(req)
        # Poll in short slices instead of one long wait: a dead worker
        # must surface as an error now, not as a (possibly infinite —
        # warmup passes timeout=inf) silent hang.  Each slice is bounded
        # by the remaining budget so the timeout stays strict; the event
        # path is unaffected: wait() returns the moment the result lands.
        # Monotonic clock: Event.wait itself is monotonic, and a wall-
        # clock NTP step must not shrink or stretch the request budget.
        deadline = (None if timeout == float("inf")
                    else time.monotonic() + timeout)
        while True:
            remaining = (None if deadline is None
                         else deadline - time.monotonic())
            if remaining is not None and remaining <= 0:
                if req.event.is_set():
                    break
                raise TimeoutError("generation timed out")
            if req.event.wait(1.0 if remaining is None
                              else min(1.0, remaining)):
                break
            if self._fatal and not req.event.is_set():
                raise RuntimeError(self._fatal)
        if req.error:
            # Service faults surface as RuntimeError (HTTP 500); only
            # genuine client errors get ValueError (HTTP 400).
            raise (RuntimeError if req.fatal else ValueError)(req.error)
        return req.result

    def warmup(self, steps: Optional[int] = None, batch: int = 1,
               all_buckets: bool = False) -> float:
        """Run one throwaway batch-`batch` generation through the worker
        so the ONE-TIME first-dispatch costs — staging params to the
        device, loading (or compiling) the bucket's decode program on
        the accelerator — are paid at boot instead of by the first
        client.

        Measured on the tunneled TPU: with a warm persistent compile
        cache the decode program deserializes in ~2 s, yet the first
        dispatch still takes 2–8 min (program/param staging through the
        host link); after `warmup` the first client request is the
        steady-state 0.6 s (docs/BENCHMARKS.md, online serving).  Warms
        the `steps` bucket (default `default_steps`); call once per
        bucket you want hot.  Returns the wall seconds spent.

        `batch` > 1 enqueues that many throwaway requests AT ONCE so the
        worker co-batches them into a single batch-`batch` dispatch,
        warming the padded BATCH bucket a deployment expecting
        concurrency will hit (the first measured concurrent burst
        otherwise pays 24–35 s of batch-bucket compile/staging —
        docs/BENCHMARKS.md "Online serving").  Clamped to `max_batch`
        (larger can never co-batch).

        Batch buckets pad to powers of two and each pow2 size is its
        OWN compiled program, so warming `batch=N` warms only N's
        padded bucket — a burst the batching window splits lands in
        SMALLER buckets (8 arriving as 5+3 dispatches as buckets 8 and
        4; measured: a CPU-saturated host split an 8-burst and paid a
        ~250 s bucket-4 compile mid-traffic despite a warmed batch-8
        bucket).  `all_buckets=True` warms every pow2 bucket from 2 up
        through `batch`'s padded size so no split can compile
        mid-traffic.
        """
        t0 = time.time()
        n = steps or self.default_steps
        audio_len = n + self.model.audio_seq_length - 1
        audio = np.zeros((audio_len, self.audio_dim), np.float32)
        batch = max(1, min(int(batch), self.max_batch))
        if batch == 1:
            if all_buckets:
                # There are no pow2 buckets below 2: all_buckets with
                # batch=1 warms only the batch-1 bucket.  Say so —
                # callers who meant "warm everything" should pass
                # batch=max_batch (the CLI's --warmup_all_buckets does).
                log.warning(
                    "warmup(all_buckets=True) with batch=1 warms only "
                    "the batch-1 bucket; pass batch=%d to warm every "
                    "bucket", self.max_batch)
            # No timeout cap: boot-time budget is the owner's problem,
            # and a first compile on a cold cache can exceed
            # request_timeout.
            self.generate(audio, steps=n, timeout=float("inf"))
            return time.time() - t0
        if all_buckets:
            # One warm per DISTINCT padded bucket ≤ batch's (the pow2 /
            # axis-multiple rule shared with _process); smallest request
            # count that pads to each.
            targets: Dict[int, int] = {}
            for k in range(2, batch + 1):
                b = decoder.padded_batch_size(k, mesh=self.mesh)
                targets.setdefault(b, k)
            sizes = [targets[b] for b in sorted(targets)]
        else:
            sizes = [batch]
        for n_req in sizes:
            self._warm_cobatch(audio, n, n_req)
        return time.time() - t0

    def _warm_cobatch(self, audio: np.ndarray, n_steps: int,
                      n_req: int, attempts: int = 3) -> None:
        """Enqueue `n_req` throwaway requests at once so the worker
        co-batches them into ONE dispatch (generate() blocks per call,
        which would serialize them into batch-1 dispatches).

        The burst landing in the intended bucket is VERIFIED, not
        assumed: the worker stamps every request with the PADDED batch
        size of the dispatch it rode in (`_Request.cobatch`), and each
        warm request must report the target bucket — per-request, so
        concurrent live traffic can neither mask a split nor fake one
        (a global batches-counter delta would).  On a CPU-saturated
        host at boot the batching window can expire between puts,
        splitting the burst into smaller buckets — warming e.g. 5- and
        3-padded buckets while the requested bucket stays cold for the
        first real concurrent burst (the exact failure warmup exists
        to prevent); a live request riding the warm dispatch likewise
        lands it in a LARGER bucket than the target.  A missed-target
        burst is retried (the stray work is not wasted — whatever
        buckets it hit are now warm); if every attempt misses, a
        warning says which bucket may still be cold."""
        if self._fatal:
            raise RuntimeError(self._fatal)
        target = decoder.padded_batch_size(n_req, mesh=self.mesh)
        for attempt in range(attempts):
            reqs = [_Request(audio, None, n_steps) for _ in range(n_req)]
            for req in reqs:
                self._bump("requests")
                self._q.put(req)
            for req in reqs:
                while not req.event.wait(1.0):
                    if self._fatal:
                        raise RuntimeError(self._fatal)
                if req.error:
                    raise (RuntimeError if req.fatal else ValueError)(
                        req.error)
            rode = sorted({req.cobatch for req in reqs})
            if rode == [target]:
                return
            if attempt + 1 < attempts:
                log.warning(
                    "warmup burst of %d split into bucket(s) %s instead "
                    "of one bucket-%d dispatch (batching window expired "
                    "mid-burst, or live traffic rode along); retrying "
                    "(%d/%d)", n_req, rode, target, attempt + 2, attempts)
        log.warning(
            "warmup for a %d-request burst never co-batched after %d "
            "attempts — the batch-%d bucket may still be cold for the "
            "first real concurrent burst", n_req, attempts, target)

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker

    # -- worker ----------------------------------------------------------

    def _collect(self) -> List[_Request]:
        item = self._q.get()
        if item is None:
            return []
        batch = [item]
        # Monotonic, like generate()'s request deadline: a backwards NTP
        # step must not stretch the batching window (every queued
        # request would stall in here for the step size).
        deadline = time.monotonic() + self.batch_window
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                # Keep the shutdown sentinel for the next _collect call so
                # the worker still observes it after this batch drains.
                self._q.put(None)
                break
            batch.append(nxt)
        return batch

    def _run(self):
        batch: List[_Request] = []
        try:
            while not self._stop.is_set():
                batch = self._collect()
                if not batch:
                    continue
                self._process(batch)
                batch = []
        except BaseException as e:
            # The per-bucket try in _process only covers decode failures;
            # anything else (collect/bucketing bugs, MemoryError) would
            # kill this daemon thread SILENTLY and strand every waiter —
            # warmup() waits with timeout=inf, so boot would hang forever.
            # Record the death, fail the in-flight batch and the queue.
            self._fatal = f"serving worker died: {type(e).__name__}: {e}"
            log.exception("serving worker died")
            pending = [r for r in batch if not r.event.is_set()]
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    pending.append(item)
            for req in pending:
                req.error = self._fatal
                req.fatal = True
                req.event.set()

    def _process(self, batch: List[_Request]):
        motion_seq = self.model.motion_seq_length
        # Bucket by QUANTIZED generation length so nearby client lengths
        # share one compiled decoder.
        buckets: Dict[int, List[_Request]] = {}
        for req in batch:
            n = decoder.max_steps(self.model, req.audio.shape[0],
                                  req.steps)
            if n <= 0:
                req.error = (f"audio too short: {req.audio.shape[0]} "
                             f"frames < {self.model.audio_seq_length}")
                req.event.set()
                continue
            # No cap: requests with different `steps` must share buckets.
            quantized = decoder.quantize_steps(n, self.steps_bucket)
            buckets.setdefault(quantized, []).append(req)

        import jax.numpy as jnp
        for n_steps, reqs in sorted(buckets.items()):
            # A failure (OOM, ...) only fails THIS bucket's requests —
            # co-batched buckets that already completed keep theirs.
            try:
                # Scan length is the bucket key (already quantized);
                # batch pads to a power of two. Compiles are bounded by
                # (steps buckets x batch buckets); padded frames/rows
                # are trimmed per request.
                audio_len = n_steps + self.model.audio_seq_length - 1
                n_real = len(reqs)
                # Next pow2, then (with a mesh) a data-axis multiple —
                # the rule shared with the Evaluator.
                batch = decoder.padded_batch_size(n_real, mesh=self.mesh)
                seeds = [np.asarray(r.seed, np.float32)
                         if r.seed is not None
                         else np.zeros((motion_seq, self.motion_dim),
                                       np.float32) for r in reqs]
                seeds += [seeds[-1]] * (batch - n_real)
                audio_rows = []
                for r in reqs:
                    row = np.zeros((audio_len, r.audio.shape[1]),
                                   np.float32)
                    row[:min(audio_len, len(r.audio))] = \
                        r.audio[:audio_len]
                    audio_rows.append(row)
                audio_rows += [audio_rows[-1]] * (batch - n_real)
                if self.mesh is not None:
                    import jax
                    from mint_tpu.parallel import mesh as mesh_lib
                    sharding = mesh_lib.batch_sharding(self.mesh)
                    motion = jax.device_put(np.stack(seeds), sharding)
                    audio = jax.device_put(np.stack(audio_rows), sharding)
                else:
                    motion = jnp.asarray(np.stack(seeds))
                    audio = jnp.asarray(np.stack(audio_rows))
                out = np.asarray(decoder.infer_auto_regressive(
                    self.model, self.params,
                    {"motion_input": motion, "audio_input": audio},
                    steps=n_steps, unroll=self.unroll))
                self._bump("batches")
                for i, req in enumerate(reqs):
                    req_steps = decoder.max_steps(
                        self.model, req.audio.shape[0], req.steps)
                    req.result = out[i, :req_steps]
                    req.cobatch = batch
                    self._bump("generated_frames", int(req_steps))
                    req.event.set()
            except Exception as e:
                for req in reqs:
                    if not req.event.is_set():
                        req.error = str(e)
                        req.event.set()


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                info = {
                    "status": "ok",
                    "motion_seq": service.model.motion_seq_length,
                    "audio_seq": service.model.audio_seq_length,
                    "motion_dim": service.motion_dim,
                }
                self._send(200, json.dumps(info).encode(),
                           "application/json")
            elif path == "/stats":
                self._send(200, json.dumps(service.stats_snapshot()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/generate":
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                arrays = _load_npy_stream(body)
                audio = arrays[0]
                seed = arrays[1] if len(arrays) > 1 else None
                # Audio/seed shape validation lives in generate() (the
                # config-derived widths), surfacing as ValueError -> 400.
                qs = parse_qs(parsed.query)
                steps = int(qs.get("steps", [service.default_steps])[0])
                out = service.generate(audio, seed=seed, steps=steps)
                self._send(200, _npy_bytes(out))
            except (ValueError, IndexError) as e:
                self._send(400, json.dumps(
                    {"error": str(e)}).encode(), "application/json")
            except TimeoutError as e:
                self._send(504, json.dumps(
                    {"error": str(e)}).encode(), "application/json")
            except Exception as e:  # never drop the connection silently
                self._send(500, json.dumps(
                    {"error": f"internal error: {e}"}).encode(),
                    "application/json")

    return Handler


def _load_npy_stream(body: bytes) -> List[np.ndarray]:
    """One or more concatenated .npy blobs -> arrays."""
    arrays = []
    buf = io.BytesIO(body)
    while buf.tell() < len(body):
        arrays.append(np.load(buf))
    return arrays


def serve(service: GenerationService, host: str = "127.0.0.1",
          port: int = 8490) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .shutdown() to stop)."""
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None):
    from absl import app, flags
    import jax

    FLAGS = flags.FLAGS
    flags.DEFINE_string("config_path", None, "Pipeline config.")
    flags.DEFINE_string("checkpoint_dir", None,
                        "Orbax checkpoint dir (e.g. converted release).")
    flags.DEFINE_string("host", "0.0.0.0", "Bind host.")
    flags.DEFINE_integer("port", 8490, "Bind port.")
    flags.DEFINE_integer("steps", 1200, "Default generation length.")
    flags.DEFINE_float("request_timeout", 900.0,
                       "Per-request generation timeout in seconds; must "
                       "cover the FIRST compile of each length bucket "
                       "(~400 s observed on a slow-compile host).")
    flags.DEFINE_integer("data_parallelism", 0,
                         "Shard decode batches over this many devices "
                         "(0 = all visible devices; 1 = single-chip).")
    flags.DEFINE_boolean("warmup", True,
                         "Run one throwaway generation at boot so the "
                         "first client request doesn't pay the one-time "
                         "param-staging / program-load / compile cost "
                         "(minutes on cold caches or tunneled hosts).")
    flags.DEFINE_integer("warmup_batch", 1,
                         "Boot-warm the batch-N bucket too: co-batch N "
                         "throwaway requests into one dispatch.  Set to "
                         "--max_batch for deployments expecting "
                         "concurrency — the first concurrent burst "
                         "otherwise pays 24-35 s of batch-bucket "
                         "compile/staging (docs/BENCHMARKS.md 'Online "
                         "serving').  Warms only N's pow2-padded "
                         "bucket; see --warmup_all_buckets.")
    flags.DEFINE_boolean("warmup_all_buckets", False,
                         "Warm EVERY pow2 batch bucket from 2 up "
                         "through --warmup_batch's padded size (through "
                         "--max_batch's if --warmup_batch is unset), not "
                         "just N's: a burst the batching window splits "
                         "lands in smaller buckets, each its own "
                         "compiled program (measured: a CPU-saturated "
                         "host split an 8-burst 5+3 and paid a ~250 s "
                         "bucket-4 compile despite a warmed batch-8 "
                         "bucket).  Costs one extra throwaway dispatch "
                         "per bucket at boot.")
    flags.DEFINE_boolean("use_bfloat16", False,
                         "Serve with bf16 compute — the throughput "
                         "configuration (~1.5x decode rate, docs/E2E.md "
                         "'Decode dtype experiment').  Default f32, the "
                         "reference's eval/scoring semantics.")
    flags.DEFINE_float("batch_window_ms", 10.0,
                       "How long the batcher holds the first queued "
                       "request for same-bucket companions.  Latency "
                       "cost is the window itself (~ms); the win is one "
                       "decode dispatch instead of several (measured "
                       "under 8-way concurrent load: docs/BENCHMARKS.md "
                       "'Online serving').")
    flags.DEFINE_integer("max_batch", 8,
                         "Close a batch early at this many requests.  "
                         "Default 8: decode throughput falls with batch "
                         "at f32 (1683 f/s at 8 vs 1180 at 32 — docs/"
                         "BENCHMARKS.md), so several small dispatches "
                         "beat one big one on throughput and worst-case "
                         "latency; raise toward 20 with --use_bfloat16.")

    def run(_):
        from mint_tpu.config.schema import load_pipeline_config
        from mint_tpu.models import builder
        from mint_tpu.models.fact import init_params
        from mint_tpu.train.checkpoint import CheckpointManager

        import jax.numpy as jnp
        pipeline = load_pipeline_config(FLAGS.config_path)
        model = builder.build(
            pipeline.multi_modal_model, is_training=False,
            compute_dtype=jnp.bfloat16 if FLAGS.use_bfloat16
            else jnp.float32)
        if FLAGS.checkpoint_dir:
            # Params-only restore against an abstract template: skips
            # both the random 120M-param init (compile + compute on the
            # device, discarded) and the saved Adam slots (~2/3 of the
            # checkpoint's bytes, never used when serving).
            from mint_tpu.models.fact import abstract_params
            params = CheckpointManager(
                FLAGS.checkpoint_dir).restore_params(abstract_params(model))
        else:
            params = init_params(model, jax.random.PRNGKey(0))
        mesh = None
        n_dev = FLAGS.data_parallelism or len(jax.devices())
        if n_dev > 1:
            from mint_tpu.parallel import mesh as mesh_lib
            mesh = mesh_lib.make_mesh(data=n_dev, model=1,
                                      devices=jax.devices()[:n_dev])
        service = GenerationService(model, params,
                                    batch_window_ms=FLAGS.batch_window_ms,
                                    max_batch=FLAGS.max_batch,
                                    default_steps=FLAGS.steps,
                                    request_timeout=FLAGS.request_timeout,
                                    mesh=mesh)
        if FLAGS.warmup:
            print("warming up the default steps bucket...", flush=True)
            dt = service.warmup()
            print(f"warmup done in {dt:.1f} s", flush=True)
            warm_batch = FLAGS.warmup_batch
            if FLAGS.warmup_all_buckets and warm_batch <= 1:
                # --warmup_all_buckets alone means "warm every bucket":
                # without this, the flag was a silent no-op unless
                # --warmup_batch was also raised.
                warm_batch = FLAGS.max_batch
            if warm_batch > 1:
                which = ("buckets 2.." if FLAGS.warmup_all_buckets
                         else "bucket ")
                print(f"warming the batch-{which}{warm_batch}...",
                      flush=True)
                dt = service.warmup(batch=warm_batch,
                                    all_buckets=FLAGS.warmup_all_buckets)
                print(f"batch warmup done in {dt:.1f} s", flush=True)
        server = serve(service, FLAGS.host, FLAGS.port)
        print(f"serving on {FLAGS.host}:{FLAGS.port}")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.shutdown()
            service.close()

    flags.mark_flag_as_required("config_path")
    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
