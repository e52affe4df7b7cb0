"""Command-line tools mirroring the reference entry points.

- ``python -m mint_tpu.tools.preprocessing`` — AIST++ -> tfrecords
  (reference ``tools/preprocessing.py``)
- ``python -m mint_tpu.tools.train`` — training (reference ``trainer.py``)
- ``python -m mint_tpu.tools.evaluate`` — continuous generation eval
  (reference ``evaluator.py``)
- ``python -m mint_tpu.tools.calculate_scores`` — FID scoring
  (reference ``tools/calculate_scores.py``)
- ``python -m mint_tpu.tools.extract_features`` — ground-truth features
  (reference ``tools/extract_aist_features.py``)
- ``python -m mint_tpu.tools.bvh_export`` — BVH export
  (reference ``tools/bvh_writer.py``)
- ``python -m mint_tpu.tools.visualize`` — skeleton GIF/PNG rendering
  (reference vedo visualization, ``tools/calculate_scores.py:54-79``)
- ``python -m mint_tpu.tools.convert_checkpoint`` — released TF ckpt ->
  Orbax
- ``python -m mint_tpu.serving.server`` — batched online inference
  (beyond-reference)
"""
