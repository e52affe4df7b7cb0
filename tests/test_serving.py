"""Serving tests: batching service + HTTP endpoint end-to-end."""

import copy
import io
import json
import os
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

import jax

from mint_tpu.config import load_pipeline_config
from mint_tpu.models import build, init_params
from mint_tpu.serving import GenerationService, serve

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")
RNG = np.random.default_rng(31)


def _tiny_model():
    cfg = copy.deepcopy(load_pipeline_config(CONFIG).multi_modal_model)
    fact = cfg.fact_model
    for mod in fact.modality:
        t = mod.model[0].transformer
        t.hidden_size = 32
        t.num_hidden_layers = 1
        t.num_attention_heads = 2
        t.intermediate_size = 64
    fact.modality_by_name("motion").sequence_length = 12
    fact.modality_by_name("motion").feature_dim = 225
    fact.modality_by_name("audio").sequence_length = 24
    cm = fact.cross_modal_model.transformer
    cm.hidden_size = 32
    cm.num_hidden_layers = 1
    cm.num_attention_heads = 2
    cm.intermediate_size = 64
    model = build(cfg, is_training=False)
    params = init_params(model, jax.random.PRNGKey(1))
    return model, params


@pytest.fixture(scope="module")
def service():
    model, params = _tiny_model()
    svc = GenerationService(model, params, batch_window_ms=30,
                            default_steps=8)
    yield svc
    svc.close()


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr, np.float32))
    return buf.getvalue()


class TestService:
    def test_warmup_primes_default_bucket(self, service):
        """warmup() runs a real batch through the worker (program +
        params staged) and doesn't disturb subsequent requests."""
        before = service.stats_snapshot()
        dt = service.warmup(steps=8)
        after = service.stats_snapshot()
        assert dt > 0
        assert after["batches"] == before["batches"] + 1
        assert after["generated_frames"] >= before["generated_frames"] + 8
        out = service.generate(
            RNG.standard_normal((40, 35)).astype(np.float32), steps=8)
        assert out.shape == (8, 225) and np.isfinite(out).all()

    def test_warmup_batch_co_batches_one_dispatch(self, service):
        """warmup(batch=N) must warm the batch-N bucket with ONE
        co-batched dispatch (N serialized batch-1 calls would warm
        nothing new); clamped to max_batch."""
        before = service.stats_snapshot()
        dt = service.warmup(steps=8, batch=4)
        after = service.stats_snapshot()
        assert dt > 0
        assert after["requests"] == before["requests"] + 4
        assert after["batches"] == before["batches"] + 1
        assert after["generated_frames"] >= \
            before["generated_frames"] + 4 * 8
        # Clamp: batch beyond max_batch can never co-batch.
        assert service.max_batch == 8
        b0 = service.stats_snapshot()["requests"]
        service.warmup(steps=8, batch=99)
        assert service.stats_snapshot()["requests"] == b0 + 8

    def test_warmup_all_buckets_one_dispatch_per_pow2(self, service):
        """all_buckets=True must warm EVERY pow2 bucket up through
        batch's padded size — one co-batched dispatch each (2, 4, 8),
        because each pow2 size is its own compiled program and a
        window-split burst lands in the smaller ones."""
        before = service.stats_snapshot()
        dt = service.warmup(steps=8, batch=8, all_buckets=True)
        after = service.stats_snapshot()
        assert dt > 0
        assert after["batches"] == before["batches"] + 3  # buckets 2,4,8
        # Smallest request count that pads to each bucket: 2→2, 3→4,
        # 5→8 (the padding does the rest; fewer throwaway rows).
        assert after["requests"] == before["requests"] + 2 + 3 + 5

    def test_warmup_split_burst_retries_and_warns(self, service, monkeypatch,
                                                  caplog):
        """A warm burst the batching window splits (CPU-saturated boot)
        must be DETECTED — not reported as a warmed bucket — and
        retried; if every attempt splits, a warning names the possibly
        cold bucket.  The split is forced deterministically by delaying
        each enqueue past the 30 ms window."""
        import logging as logging_lib

        orig_put = service._q.put

        def slow_put(item):
            time.sleep(0.5)  # every gap exceeds the 30 ms window
            orig_put(item)

        monkeypatch.setattr(service._q, "put", slow_put)
        audio = np.zeros((8 + service.model.audio_seq_length - 1,
                          service.audio_dim), np.float32)
        before = service.stats_snapshot()
        with caplog.at_level(logging_lib.WARNING,
                             logger="mint_tpu.serving.server"):
            service._warm_cobatch(audio, 8, 2, attempts=2)
        after = service.stats_snapshot()
        # Both attempts split 2 requests into 2 batch-1 dispatches.
        assert after["requests"] == before["requests"] + 4
        assert after["batches"] == before["batches"] + 4
        assert "split into" in caplog.text
        assert "never co-batched" in caplog.text

    def test_single_request(self, service):
        audio = RNG.standard_normal((40, 35)).astype(np.float32)
        out = service.generate(audio, steps=10)
        assert out.shape == (10, 225)
        assert np.isfinite(out).all()

    def test_steps_clamped_to_audio(self, service):
        audio = RNG.standard_normal((30, 35)).astype(np.float32)
        out = service.generate(audio, steps=1200)
        assert out.shape == (7, 225)  # 30 - 24 + 1

    def test_concurrent_requests_batch(self, service):
        before = service.stats["batches"]
        results = [None] * 6

        def call(i):
            audio = RNG.standard_normal((40, 35)).astype(np.float32)
            results[i] = service.generate(audio, steps=10)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and r.shape == (10, 225)
                   for r in results)
        # 6 concurrent same-length requests ride fewer than 6 batches.
        assert service.stats["batches"] - before < 6

    def test_seed_changes_output(self, service):
        audio = RNG.standard_normal((40, 35)).astype(np.float32)
        base = service.generate(audio, steps=5)
        seeded = service.generate(
            audio, seed=RNG.standard_normal((12, 225)).astype(np.float32),
            steps=5)
        assert not np.allclose(base, seeded)

    def test_too_short_audio_errors(self, service):
        with pytest.raises(ValueError, match="audio too short"):
            service.generate(np.zeros((10, 35), np.float32), steps=5)

    def test_request_timeout_default_comes_from_service(self, service):
        """generate() without an explicit timeout uses the service's
        request_timeout (CLI --request_timeout) — a too-small budget
        must surface as TimeoutError, not hang."""
        old = service.request_timeout
        service.request_timeout = 1e-4
        try:
            with pytest.raises(TimeoutError):
                service.generate(
                    RNG.standard_normal((40, 35)).astype(np.float32),
                    steps=10)
        finally:
            service.request_timeout = old
        # An explicit per-call timeout still overrides the default.
        out = service.generate(
            RNG.standard_normal((40, 35)).astype(np.float32),
            steps=10, timeout=120.0)
        assert out.shape == (10, 225)


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, service):
        srv = serve(service, "127.0.0.1", 0)
        port = srv.server_address[1]
        yield f"http://127.0.0.1:{port}"
        srv.shutdown()

    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            info = json.loads(r.read())
        assert info["status"] == "ok"
        assert info["motion_dim"] == 225

    def test_generate_roundtrip(self, server):
        audio = RNG.standard_normal((40, 35)).astype(np.float32)
        req = urllib.request.Request(f"{server}/generate?steps=6",
                                     data=_npy(audio), method="POST")
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (6, 225)

    def test_generate_with_seed_blob(self, server):
        audio = RNG.standard_normal((40, 35)).astype(np.float32)
        seed = RNG.standard_normal((12, 225)).astype(np.float32)
        body = _npy(audio) + _npy(seed)
        req = urllib.request.Request(f"{server}/generate?steps=6",
                                     data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (6, 225)

    def test_bad_shape_400(self, server):
        req = urllib.request.Request(
            f"{server}/generate",
            data=_npy(np.zeros((5, 7), np.float32)), method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400
        assert "audio features" in json.loads(err.value.read())["error"]

    def test_stats(self, server):
        with urllib.request.urlopen(f"{server}/stats") as r:
            stats = json.loads(r.read())
        assert stats["requests"] > 0 and stats["generated_frames"] > 0

    def test_unknown_route_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f"{server}/nope")
        assert err.value.code == 404

    # -- adversarial request bodies (server must answer, then keep
    #    serving the next well-formed request) ---------------------------

    def _assert_error_then_recovery(self, server, body, headers=None):
        req = urllib.request.Request(f"{server}/generate", data=body,
                                     method="POST")
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code in (400, 500), err.value.code
        json.loads(err.value.read())  # structured error body
        # The server must still serve after the bad request.
        audio = RNG.standard_normal((40, 35)).astype(np.float32)
        good = urllib.request.Request(f"{server}/generate?steps=4",
                                      data=_npy(audio), method="POST")
        with urllib.request.urlopen(good) as r:
            assert np.load(io.BytesIO(r.read())).shape == (4, 225)

    def test_garbage_body(self, server):
        self._assert_error_then_recovery(server, b"\x00garbage" * 30)

    def test_truncated_npy_body(self, server):
        whole = _npy(RNG.standard_normal((40, 35)).astype(np.float32))
        self._assert_error_then_recovery(server, whole[:len(whole) // 3])

    def test_empty_body(self, server):
        self._assert_error_then_recovery(server, b"")

    def test_truncated_second_blob(self, server):
        audio = _npy(RNG.standard_normal((40, 35)).astype(np.float32))
        seed = _npy(RNG.standard_normal((12, 225)).astype(np.float32))
        self._assert_error_then_recovery(server, audio + seed[:-40])

    def test_mid_batch_client_disconnect(self, server):
        """A client that hangs up before its response is written must not
        take down the handler thread or corrupt the batch for others."""
        import socket
        from urllib.parse import urlparse

        host, port = urlparse(server).netloc.split(":")
        audio = _npy(RNG.standard_normal((40, 35)).astype(np.float32))
        s = socket.create_connection((host, int(port)))
        s.sendall(b"POST /generate?steps=6 HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Length: %d\r\n\r\n" % len(audio))
        s.sendall(audio)
        s.close()  # hang up without reading the response
        # A concurrent + a subsequent request must still succeed.
        for _ in range(2):
            good = urllib.request.Request(f"{server}/generate?steps=4",
                                          data=_npy(np.load(io.BytesIO(
                                              audio))), method="POST")
            with urllib.request.urlopen(good, timeout=120) as r:
                assert np.load(io.BytesIO(r.read())).shape == (4, 225)


class TestMeshServing:
    """Multi-chip serving: decode sharded over the mesh's data axis."""

    def _generate_all(self, svc, audios, steps):
        """Issue all requests concurrently so they ride one batch."""
        results = [None] * len(audios)
        errors = []

        def call(i):
            try:
                results[i] = svc.generate(audios[i], steps=steps)
            except Exception as e:  # surfaced below
                errors.append(e)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(audios))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        return results

    def test_sharded_decode_matches_single_device(self):
        from mint_tpu.parallel import mesh as mesh_lib

        model, params = _tiny_model()
        mesh = mesh_lib.make_mesh(data=8, model=1)
        svc_one = GenerationService(model, params, batch_window_ms=200,
                                    default_steps=8)
        svc_mesh = GenerationService(model, params, batch_window_ms=200,
                                     default_steps=8, mesh=mesh)
        try:
            # 5 concurrent requests: both services pad the batch to 8
            # (pow2 / data-axis multiple), so the compiled programs see
            # the same padded shapes.  Sharding changes XLA's fusion
            # order, so equality is tight-numeric, not bitwise; the
            # sharded path itself must be bitwise-deterministic across
            # repeat calls (asserted below).
            audios = [RNG.standard_normal((40, 35)).astype(np.float32)
                      for _ in range(5)]
            got_one = self._generate_all(svc_one, audios, steps=10)
            before = svc_mesh.stats_snapshot()["batches"]
            got_mesh = self._generate_all(svc_mesh, audios, steps=10)
            assert svc_mesh.stats_snapshot()["batches"] - before < 5
            for a, b in zip(got_one, got_mesh):
                assert a.shape == b.shape == (10, 225)
                np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
            repeat = self._generate_all(svc_mesh, audios, steps=10)
            for b, r in zip(got_mesh, repeat):
                assert b.tobytes() == r.tobytes()
        finally:
            svc_one.close()
            svc_mesh.close()

    def test_mesh_serving_with_committed_params(self):
        """Params restored from a checkpoint are COMMITTED to one device
        (orbax SingleDeviceSharding); mesh serving must replicate them at
        boot or jit raises 'Received incompatible devices' on the first
        decode (crashed the real --checkpoint_dir server path)."""
        from mint_tpu.parallel import mesh as mesh_lib

        model, params = _tiny_model()
        committed = jax.device_put(params, jax.devices()[0])
        mesh = mesh_lib.make_mesh(data=8, model=1)
        svc = GenerationService(model, committed, default_steps=8,
                                mesh=mesh)
        try:
            out = svc.generate(
                RNG.standard_normal((40, 35)).astype(np.float32), steps=8)
            assert out.shape == (8, 225) and np.isfinite(out).all()
        finally:
            svc.close()

    def test_worker_death_fails_requests_fast(self):
        """An exception OUTSIDE the per-bucket try (collect/bucketing bug)
        must fail waiting and queued requests with a diagnostic — not
        strand them until timeout (warmup waits with timeout=inf)."""
        model, params = _tiny_model()
        svc = GenerationService(model, params, default_steps=8)
        try:
            def boom(batch):
                raise MemoryError("simulated fatal worker error")

            svc._process = boom
            audio = RNG.standard_normal((40, 35)).astype(np.float32)
            # ValueError when the dying worker set req.error first,
            # RuntimeError when the waiter saw the death flag — either
            # way it carries the diagnostic and arrives promptly.
            with pytest.raises((RuntimeError, ValueError),
                               match="serving worker died"):
                svc.generate(audio, steps=8, timeout=60.0)
            # Later requests fail fast, before enqueueing.
            with pytest.raises(RuntimeError, match="serving worker died"):
                svc.generate(audio, steps=8, timeout=60.0)
        finally:
            svc.close()

    def test_warmup_on_mesh(self):
        """Boot warmup composes with sharded decode: the throwaway batch
        pads to the data-axis multiple and later requests are unaffected."""
        from mint_tpu.parallel import mesh as mesh_lib

        model, params = _tiny_model()
        mesh = mesh_lib.make_mesh(data=8, model=1)
        svc = GenerationService(model, params, default_steps=8, mesh=mesh)
        try:
            dt = svc.warmup()
            assert dt > 0
            assert svc.stats_snapshot()["batches"] == 1
            out = svc.generate(
                RNG.standard_normal((40, 35)).astype(np.float32), steps=8)
            assert out.shape == (8, 225) and np.isfinite(out).all()
        finally:
            svc.close()

    def test_mesh_pads_to_data_axis_multiple(self):
        """A single request on a 6-wide data axis must still shard: the
        pow2 pad (1) is rounded up to the axis multiple (6)."""
        from mint_tpu.parallel import mesh as mesh_lib

        model, params = _tiny_model()
        mesh = mesh_lib.make_mesh(data=6, model=1,
                                  devices=jax.devices()[:6])
        svc = GenerationService(model, params, default_steps=8, mesh=mesh)
        try:
            audio = RNG.standard_normal((40, 35)).astype(np.float32)
            out = svc.generate(audio, steps=10)
            assert out.shape == (10, 225)
            assert np.isfinite(out).all()
        finally:
            svc.close()


class TestDirectAPIValidation:
    """generate() must validate AUDIO per-request too (not only the HTTP
    layer): a malformed array reaching the worker's per-bucket batch
    fails every co-batched request."""

    def test_1d_audio_rejected(self, service):
        with pytest.raises(ValueError, match="audio features"):
            service.generate(np.zeros(40, np.float32), steps=4)

    def test_wrong_width_rejected(self, service):
        with pytest.raises(ValueError, match="audio features"):
            service.generate(np.zeros((40, 7), np.float32), steps=4)

    def test_width_follows_model_config(self):
        """Validation uses the config-derived audio width, not a
        hardcoded 35 (a non-AIST frontend config used to warm up with
        its real width and then 400 every valid request)."""
        model, params = _tiny_model()
        svc = GenerationService(model, params, default_steps=4)
        try:
            assert svc.audio_dim == (
                model.config.modality_by_name("audio").feature_dim or 35)
        finally:
            svc.close()
