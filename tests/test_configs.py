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
