"""Measure the per-pass eval-corpus parse cost that Evaluator's
cache_examples removes (round-3 follow-up to docs/ROUND3.md item 1).

Measured on the recorded-E2E corpus (187 MB, 88 testval clips, warm
page cache): corpus_parse_s=0.2 — i.e. the stage-5' "~100 s dataset
build" attribution in docs/E2E.md was NOT the tfrecord parse; the
dominant pre-decode cost in the eval CLI was the discarded random
init_params (now skipped — tools/evaluate.py uses abstract_params).

Host-side only (tfrecord read + proto parse + window preprocessing) —
runs on the CPU backend; no TPU required.

Usage: python scripts/exp_eval_corpus_cache.py [corpus_glob]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from mint_tpu.config.schema import load_pipeline_config  # noqa: E402
from mint_tpu.data import pipeline as data_pipeline  # noqa: E402
from mint_tpu.eval.evaluator import Evaluator  # noqa: E402
from mint_tpu.models import builder  # noqa: E402

CORPUS = (sys.argv[1] if len(sys.argv) > 1
          else "/tmp/mint_e2e/data/*_tfrecord-testval*")


def main():
    pipe = load_pipeline_config("configs/fact_v5_deeper_t10_cm12.config")
    pipe.eval_dataset.data_files = CORPUS
    model = builder.build(pipe.multi_modal_model, is_training=True)

    def dataset():
        return data_pipeline.create_input(
            pipe.eval_config, pipe.eval_dataset, is_training=False,
            use_tpu=False)

    ev = Evaluator(model, dataset, steps=1200)
    t0 = time.perf_counter()
    examples = ev._examples()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ev._examples()
    warm = time.perf_counter() - t0
    print(f"clips={len(examples)} corpus_parse_s={cold:.1f} "
          f"cached_s={warm:.4f}")


if __name__ == "__main__":
    main()
