"""TF (reference) checkpoint -> JAX params converter.

The released ``fact_v5_deeper_t10_cm12`` checkpoint (reference
``README.md:38-39``) is a TF2 object-graph checkpoint of
``tf.train.Checkpoint(model=FACTModel(...), optimizer=...)``.  Its keys
are attribute paths through the Keras object graph (reference
``mint/core/fact_model.py:29-70``, ``base_models.py``):

  model/motion_linear_embedding/net/kernel/.ATTRIBUTES/VARIABLE_VALUE
  model/motion_pos_embedding/pos_embedding/.ATTRIBUTES/VARIABLE_VALUE
  model/motion_transformer/net/layer_with_weights-{2i}/fn/norm/{gamma,beta}
  model/motion_transformer/net/layer_with_weights-{2i}/fn/fn/to_qkv/kernel
  model/motion_transformer/net/layer_with_weights-{2i}/fn/fn/to_out/...
  model/motion_transformer/net/layer_with_weights-{2i+1}/fn/fn/net/
        layer_with_weights-{0,1}/{kernel,bias}
  model/cross_modal_layer/transformer_layer/... (same block pattern)
  model/cross_modal_layer/cross_output_layer/{kernel,bias}

Keras Dense kernels are stored [in_dim, out_dim] — exactly our Flax layout
(mint_tpu/models/layers.py docstring) — so conversion is a pure name
mapping with zero reshapes/transposes.

Requires tensorflow (reader only); fails with a clear message otherwise.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"

# (tf path regex after the `model/` prefix) -> flax path builder.
_NORM = {"gamma": "scale", "beta": "bias"}


def _flax_key_for(tf_key: str) -> Tuple[str, ...]:
    """Map one reference TF variable path to our Flax params path.

    Raises KeyError for unmapped (non-model / optimizer) variables.
    """
    if not tf_key.endswith(_SUFFIX):
        raise KeyError(tf_key)
    path = tf_key[:-len(_SUFFIX)]
    if not path.startswith("model/"):
        raise KeyError(tf_key)
    path = path[len("model/"):]

    # Linear embeddings: {m}_linear_embedding/net/{kernel,bias}
    m = re.fullmatch(r"(\w+)_linear_embedding/net/(kernel|bias)", path)
    if m:
        return (f"{m.group(1)}_linear_embedding", "dense", m.group(2))

    # Position embeddings: Keras tracks the add_weight variable under its
    # weight NAME "position_embedding" (base_models.py:148-152), not the
    # python attribute; accept both spellings.
    m = re.fullmatch(r"(\w+)_pos_embedding/(?:pos|position)_embedding",
                     path)
    if m:
        return (f"{m.group(1)}_pos_embedding", "pos_embedding")

    # Transformers (single-modal or cross-modal).
    m = re.fullmatch(
        r"(\w+_transformer|cross_modal_layer/transformer_layer)"
        r"/net/layer_with_weights-(\d+)/fn/(.+)", path)
    if m:
        owner = m.group(1)
        prefix = (("cross_modal_layer", "transformer")
                  if owner.startswith("cross_modal_layer") else (owner,))
        lw = int(m.group(2))
        block = f"block_{lw // 2}"
        rest = m.group(3)
        if lw % 2 == 0:  # attention block
            mm = re.fullmatch(r"norm/(gamma|beta)", rest)
            if mm:
                return prefix + (block, "norm_attn", _NORM[mm.group(1)])
            mm = re.fullmatch(r"fn/(to_qkv|to_out)/(kernel|bias)", rest)
            if mm:
                return prefix + (block, "attn", mm.group(1), mm.group(2))
        else:  # mlp block
            mm = re.fullmatch(r"norm/(gamma|beta)", rest)
            if mm:
                return prefix + (block, "norm_mlp", _NORM[mm.group(1)])
            mm = re.fullmatch(
                r"fn/net/layer_with_weights-([01])/(kernel|bias)", rest)
            if mm:
                fc = "fc1" if mm.group(1) == "0" else "fc2"
                return prefix + (block, "mlp", fc, mm.group(2))

    # Cross-modal output head.
    m = re.fullmatch(r"cross_modal_layer/cross_output_layer/(kernel|bias)",
                     path)
    if m:
        return ("cross_modal_layer", "cross_output_layer", m.group(1))

    raise KeyError(tf_key)


def load_tf_variables(ckpt_path: str) -> Dict[str, np.ndarray]:
    """All model variables from a TF checkpoint, by raw key."""
    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "tensorflow is required to read the reference checkpoint; "
            "install it or convert on a machine that has it") from e
    out = {}
    for key in reader.get_variable_to_shape_map():
        if key.endswith(_SUFFIX) and key.startswith("model/"):
            out[key] = reader.get_tensor(key)
    return out


def convert_tf_checkpoint(ckpt_path: str, params_template) -> Tuple[
        dict, Dict[str, str]]:
    """Convert a reference TF checkpoint into a Flax params pytree.

    Args:
      ckpt_path: TF checkpoint prefix (e.g. ``.../ckpt-200000``).
      params_template: our ``model.init(...)`` pytree (defines structure +
        expected shapes).

    Returns:
      (params, report): converted params, and a dict of any skipped TF keys
      -> reason.  Raises on missing Flax leaves or shape mismatches.
    """
    tf_vars = load_tf_variables(ckpt_path)

    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    report: Dict[str, str] = {}
    for key, value in tf_vars.items():
        try:
            flat[_flax_key_for(key)] = value
        except KeyError:
            report[key] = "unmapped"

    import jax

    leaves = jax.tree_util.tree_flatten_with_path(params_template)[0]
    filled = {}
    missing = []
    for keypath, leaf in leaves:
        names = tuple(getattr(k, "key", str(k)) for k in keypath)
        lookup = names[1:] if names and names[0] == "params" else names
        if lookup in flat:
            value = flat.pop(lookup)
            if tuple(value.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(lookup)}: "
                    f"ckpt {value.shape} vs model {leaf.shape}")
            filled["/".join(names)] = np.asarray(value, leaf.dtype)
        else:
            missing.append("/".join(names))
    if missing:
        raise ValueError(f"checkpoint missing {len(missing)} params, e.g. "
                         + ", ".join(missing[:5]))
    for lookup in flat:
        report["/".join(lookup)] = "extra (not in model)"

    def rebuild(keypath, leaf):
        names = "/".join(getattr(k, "key", str(k)) for k in keypath)
        return filled[names]

    params = jax.tree_util.tree_map_with_path(rebuild, params_template)
    return params, report


def main(argv=None):
    from absl import app, flags
    import jax

    FLAGS = flags.FLAGS
    flags.DEFINE_string("tf_checkpoint", None,
                        "TF checkpoint prefix (reference release).")
    flags.DEFINE_string("config_path", None, "Pipeline config.")
    flags.DEFINE_string("output_dir", None,
                        "Orbax checkpoint dir to write (step 0).")

    def run(_):
        from mint_tpu.config.schema import load_pipeline_config
        from mint_tpu.models import builder
        from mint_tpu.models.fact import abstract_params
        from mint_tpu.train.checkpoint import CheckpointManager
        from mint_tpu.train.trainer import TrainState

        pipeline = load_pipeline_config(FLAGS.config_path)
        model = builder.build(pipeline.multi_modal_model, is_training=False)
        # Abstract template: the converter only reads leaf shapes/
        # dtypes, so materializing a random 120M-param init here
        # (compile + compute on the default device) was pure waste.
        template = abstract_params(model)
        params, report = convert_tf_checkpoint(FLAGS.tf_checkpoint,
                                               template)
        for key, why in sorted(report.items()):
            print(f"skipped: {key} ({why})")
        manager = CheckpointManager(FLAGS.output_dir, max_to_keep=1)
        import jax.numpy as jnp
        manager.save(0, TrainState(step=jnp.int32(0), params=params,
                                   opt_state=None), force=True)
        manager.wait_until_finished()
        print(f"wrote converted checkpoint to {FLAGS.output_dir}")

    flags.mark_flag_as_required("tf_checkpoint")
    flags.mark_flag_as_required("config_path")
    flags.mark_flag_as_required("output_dir")
    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
