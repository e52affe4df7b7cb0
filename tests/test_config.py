"""Config-system tests: textproto grammar + shipped-config parity.

Mirrors the role of the reference's config-driven setup
(mint/utils/config_util.py, mint/utils/inputs_util_test.py).
"""

import os

from mint_tpu.config import (
    configs_dict,
    load_pipeline_config,
    textproto,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def test_textproto_grammar():
    msg = textproto.parse(
        """
        # comment
        a: 1
        b: -2.5e-3
        c: "hello world"
        d: true
        e: SEQUENCE_WISE
        nested { x: 1 }
        nested: { x: 2 }
        f: 1e-4
        """
    )
    assert msg.get("a") == 1
    assert abs(msg.get("b") + 2.5e-3) < 1e-12
    assert msg.get("c") == "hello world"
    assert msg.get("d") is True
    assert msg.get("e") == "SEQUENCE_WISE"
    assert [m.get("x") for m in msg.get_all("nested")] == [1, 2]
    assert abs(msg.get("f") - 1e-4) < 1e-12


def test_shipped_config_parses():
    pipeline = load_pipeline_config(CONFIG)
    fact = pipeline.multi_modal_model.fact_model
    assert fact is not None
    assert pipeline.multi_modal_model.which() == "fact_model"

    audio = fact.modality_by_name("audio")
    motion = fact.modality_by_name("motion")
    assert audio.sequence_length == 240
    assert motion.sequence_length == 120
    assert motion.feature_dim == 225

    audio_tf = audio.model[0].transformer
    assert audio_tf.num_attention_heads == 10
    assert audio_tf.hidden_size == 800
    assert audio_tf.num_hidden_layers == 2
    # Proto defaults apply for unset fields.
    assert audio_tf.intermediate_size == 3072
    assert audio_tf.initializer_range == 0.02

    cm = fact.cross_modal_model
    assert cm.modality_a == "motion" and cm.modality_b == "audio"
    assert cm.transformer.num_hidden_layers == 12
    assert cm.output_layer.out_dim == 225
    assert cm.cross_modal_concat_dim == "SEQUENCE_WISE"

    tc = pipeline.train_config
    assert tc.batch_size == 32
    lr = tc.learning_rate
    assert lr.which() == "manual_step_learning_rate"
    ms = lr.manual_step_learning_rate
    assert abs(ms.initial_learning_rate - 1e-4) < 1e-12
    assert [s.step for s in ms.schedule] == [100000, 150000]
    assert abs(ms.schedule[0].learning_rate - 1e-5) < 1e-12

    assert pipeline.eval_config.batch_size == 1

    ds = pipeline.train_dataset
    assert ds.input_length_sec == 120.0
    assert ds.target_length_sec == 20
    assert ds.target_shift_sec == 120
    assert ds.data_augmentation_options == ["fact_preprocessor"]
    mods = {m.general_modality.feature_name: m.general_modality
            for m in ds.modality}
    assert mods["motion"].dimension == 219
    assert mods["motion"].sample_rate == 1
    assert mods["audio"].dimension == 35
    assert mods["audio"].sample_rate == 2


def test_reference_config_parses_identically():
    """The upstream shipped config must parse unchanged (drop-in compat)."""
    ref = "/root/reference/configs/fact_v5_deeper_t10_cm12.config"
    if not os.path.exists(ref):
        import pytest
        pytest.skip("reference config not available")
    ours = load_pipeline_config(CONFIG)
    theirs = load_pipeline_config(ref)
    assert configs_dict(ours).keys() == configs_dict(theirs).keys()
    assert ours == theirs


def test_config_override():
    pipeline = load_pipeline_config(
        CONFIG, config_override="train_config: { batch_size: 8 }")
    assert pipeline.train_config.batch_size == 8


def test_dumps_roundtrip():
    msg = textproto.parse_file(CONFIG)
    text = textproto.dumps(msg)
    msg2 = textproto.parse(text)
    assert msg.to_dict() == msg2.to_dict()


def test_serialize_roundtrip_shipped_config(tmp_path):
    """save_pipeline_config -> load_pipeline_config is the identity on the
    shipped flagship config (reference config_util.py:53-89 behavior)."""
    from mint_tpu.config.serialize import save_pipeline_config
    pipeline = load_pipeline_config(CONFIG)
    path = save_pipeline_config(pipeline, str(tmp_path))
    assert path.endswith("pipeline.config")
    assert load_pipeline_config(path) == pipeline


def test_config_override_merges_recursively():
    """Overrides merge field-by-field like text_format.Merge — a nested
    override must not wipe sibling fields of the same message."""
    p = load_pipeline_config(
        CONFIG, config_override="train_config { batch_size: 8 }")
    assert p.train_config.batch_size == 8
    # Sibling learning_rate subtree from the file must survive.
    lr = p.train_config.learning_rate
    assert lr.which() == "manual_step_learning_rate"
    assert lr.manual_step_learning_rate.schedule[0].step == 100000
    # Scalar override deeper in the tree.
    p2 = load_pipeline_config(
        CONFIG, config_override=(
            "train_config { learning_rate { manual_step_learning_rate {"
            " initial_learning_rate: 0.5 } } }"))
    ms = p2.train_config.learning_rate.manual_step_learning_rate
    assert ms.initial_learning_rate == 0.5
    assert len(ms.schedule) == 2  # file's repeated entries kept


def test_override_repeated_scalar_appends():
    """text_format.Merge APPENDS repeated scalar occurrences; singular
    scalars are overwritten.  Repeated-ness comes from the dataclass
    schema AT THE CURRENT MESSAGE TYPE (not from occurrence counting,
    and not from a global name set that could collide with a same-named
    List field of an unrelated message) — the single-occurrence-each
    case must still append."""
    from mint_tpu.config.schema import (ManualStepLearningRate,
                                        MotionGenerationMetrics,
                                        _merge_msg)

    base = textproto.parse(
        "pck_thresholds: 0.1 pck_thresholds: 0.2 num_joints: 1")
    over = textproto.parse("pck_thresholds: 0.3 num_joints: 2")
    _merge_msg(base, over, MotionGenerationMetrics)
    assert base.get_all("pck_thresholds") == [0.1, 0.2, 0.3]
    assert base.get_all("num_joints") == [2]
    # ONE occurrence on each side of a schema-repeated field: append,
    # not overwrite (the old occurrence-count heuristic got this wrong).
    base2 = textproto.parse("pck_thresholds: 0.05")
    _merge_msg(base2, textproto.parse("pck_thresholds: 0.1"),
               MotionGenerationMetrics)
    assert base2.get_all("pck_thresholds") == [0.05, 0.1]
    # When the dataclass chain is NOT available (untyped call) a
    # single-occurrence field is singular: last-one-wins, never a
    # name-based guess.  Typed chains through flattened wrappers keep
    # proto semantics via _TRANSPARENT_WRAPPERS (test below).
    base2b = textproto.parse("pck_thresholds: 0.05")
    _merge_msg(base2b, textproto.parse("pck_thresholds: 0.1"))  # untyped
    assert base2b.get_all("pck_thresholds") == [0.1]
    # Repeated MESSAGE fields append as well (e.g. LR schedule entries).
    base3 = textproto.parse("schedule { step: 1 } ")
    _merge_msg(base3, textproto.parse("schedule { step: 2 }"),
               ManualStepLearningRate)
    assert [m.get("step") for m in base3.get_all("schedule")] == [1, 2]
    # Fields UNKNOWN to the schema (forward-compat keys that only live in
    # the Msg tree) fall back to the occurrence-count heuristic: a field
    # with multiple occurrences on either side must never be collapsed.
    base4 = textproto.parse("b: 7")
    _merge_msg(base4, textproto.parse("b: 8 b: 9"))
    assert base4.get_all("b") == [7, 8, 9]
    base5 = textproto.parse("x: 1 x: 2")
    _merge_msg(base5, textproto.parse("x: 3 x: 4"))
    assert base5.get_all("x") == [1, 2, 3, 4]


def test_override_appends_repeated_scalar_through_flattened_wrapper(
        tmp_path):
    """Regression: the proto's ``eval_metric`` wrapper message is
    flattened away by the dataclass schema (EvalConfig holds
    motion_generation_metrics directly), so a naive per-type walk breaks
    at that key.  A single-occurrence ``pck_thresholds`` override
    reaching it through the REAL ``load_pipeline_config(
    config_override=...)`` root path must still APPEND (protobuf Merge
    semantics) — _TRANSPARENT_WRAPPERS keeps the typed walk alive
    through the wrapper; the occurrence-count heuristic alone overwrote
    it."""
    path = tmp_path / "with_metric.config"
    path.write_text(
        "eval_config { eval_metric { motion_generation_metrics {"
        " pck_thresholds: 0.05 } } }\n")
    pipeline = load_pipeline_config(
        str(path),
        config_override="eval_config { eval_metric {"
                        " motion_generation_metrics {"
                        " pck_thresholds: 0.1 } } }")
    mm = pipeline.eval_config.motion_generation_metrics
    assert mm is not None
    assert mm.pck_thresholds == [0.05, 0.1]


def test_override_switches_oneof_member():
    """protobuf Merge semantics: setting a oneof member CLEARS its
    siblings.  An override switching the LR schedule oneof to a member
    that sorts later in which()'s fixed probe order must actually take
    effect (it used to leave both members set, and which() found the
    base's member first — the override silently did nothing)."""
    p = load_pipeline_config(
        CONFIG,
        config_override="train_config { learning_rate {"
                        " cosine_decay_learning_rate {"
                        " total_steps: 100 } } }")
    lr = p.train_config.learning_rate
    assert lr.which() == "cosine_decay_learning_rate"
    assert lr.manual_step_learning_rate is None
    assert lr.cosine_decay_learning_rate.total_steps == 100

    # Same member: merge field-by-field, not replace.
    p2 = load_pipeline_config(
        CONFIG,
        config_override="train_config { learning_rate {"
                        " manual_step_learning_rate {"
                        " initial_learning_rate: 0.5 } } }")
    lr2 = p2.train_config.learning_rate
    assert lr2.which() == "manual_step_learning_rate"
    assert lr2.manual_step_learning_rate.initial_learning_rate == 0.5
    assert lr2.manual_step_learning_rate.schedule  # base's schedule kept


def test_override_switches_modality_model_oneof(tmp_path):
    """ModalityModel's {transformer, mlp} oneof through a repeated
    parent: overriding the whole modality list entry's model."""
    path = tmp_path / "base.config"
    path.write_text(
        "multi_modal_model { fact_model { modality {"
        " feature_name: \"motion\" model { transformer {"
        " hidden_size: 64 } } } } }\n")
    p = load_pipeline_config(str(path))
    m = p.multi_modal_model.fact_model.modality[0].model[0]
    assert m.which() == "transformer"


def test_serialize_quotes_allcaps_string_fields(tmp_path):
    """A genuine STRING field whose value happens to be ALL_CAPS must be
    quoted in the snapshot (protobuf text_format rejects a bare
    identifier for a string field); enum fields stay bare."""
    from mint_tpu.config.serialize import pipeline_to_text, \
        save_pipeline_config

    pipeline = load_pipeline_config(CONFIG)
    pipeline.train_dataset.name = "AIST"
    text = pipeline_to_text(pipeline)
    assert 'name: "AIST"' in text
    # Enum field values remain bare identifiers.
    pipeline.train_dataset.window_type = "BEGINNING"
    text = pipeline_to_text(pipeline)
    assert "window_type: BEGINNING" in text
    assert 'window_type: "BEGINNING"' not in text
    # And the snapshot still round-trips.
    path = save_pipeline_config(pipeline, str(tmp_path))
    assert load_pipeline_config(path) == pipeline
