"""Config preset tests: the four task bundles, JSON round trip, model/train
config construction (SURVEY.md §5 config row)."""

import pytest

from sse_tpu.configs import PRESETS, TaskConfig, preset
from sse_tpu.models.sse import NetworkMode


def test_four_presets():
    assert set(PRESETS) == {"classification", "ranking", "crosslingual", "qna"}


def test_preset_overrides():
    c = preset("ranking", batch_size=32, hidden=64)
    assert c.batch_size == 32 and c.hidden == 64
    assert c.network_mode == "dual-encoder"


def test_json_round_trip(tmp_path):
    c = preset("qna", max_epochs=3)
    p = str(tmp_path / "config.json")
    c.save(p)
    assert TaskConfig.load(p) == c


def test_model_config_modes():
    clf = PRESETS["classification"].model_config(vocab_size=1000, num_targets=77)
    assert clf.mode == NetworkMode.SOURCE_ENCODER_ONLY
    assert clf.num_targets == 77
    dual = PRESETS["ranking"].model_config(vocab_size=1000, num_targets=77)
    assert dual.mode == NetworkMode.DUAL_ENCODER
    assert dual.tgt_tower is not None


def test_train_config_fields():
    t = PRESETS["crosslingual"].train_config()
    assert t.loss.kind == "sampled"
    assert t.loss.num_negatives == 128


def test_unknown_json_keys_ignored():
    c = TaskConfig.from_json('{"task_type": "qna", "bogus_future_field": 1}')
    assert c.task_type == "qna"


def test_recipes_exist_and_apply():
    """r4 verdict item 4: the measured wave-6/r4 recipes ship as named
    presets (BASELINE.md wave-6 + r4 transformer wave)."""
    from sse_tpu.configs import RECIPES

    assert set(RECIPES) == {"compositional", "transformer"}
    c = preset("ranking", recipe="compositional")
    assert (c.cell, c.num_layers, c.residual) == ("lstm", 3, True)
    assert c.learning_rate == 0.003 and c.dropout == 0.1
    assert c.max_epochs == 40
    # the recipe layers on the TASK preset: ranking's loss setup survives
    assert c.loss_kind == "sampled" and c.num_hard_negatives == 16

    t = preset("ranking", recipe="transformer")
    assert (t.cell, t.num_layers) == ("transformer", 4)
    assert t.pos_encoding == "rope" and t.learning_rate == 0.001
    assert t.dropout == 0.0  # measured: dropout hurts transformers here


def test_recipe_explicit_flags_win():
    c = preset("qna", recipe="compositional", num_layers=2, dropout=0.0)
    assert c.cell == "lstm" and c.num_layers == 2 and c.dropout == 0.0


def test_transformer_default_pe_is_rope():
    """r4 verdict weak #4a: `--cell transformer` must not default to the
    measured-worst sinusoid PE (0.3157 vs RoPE 0.8198, BASELINE.md r4)."""
    from sse_tpu.models.towers import TowerConfig

    assert TaskConfig().pos_encoding == "rope"
    assert TowerConfig(vocab_size=8).pos_encoding == "rope"
    c = preset("ranking", cell="transformer")
    m = c.model_config(vocab_size=100, num_targets=10)
    assert m.src_tower.pos_encoding == "rope"
