"""TrainConfig.validate() — the shared knob-compatibility predicate — and
the flagship preset configs (examples/*_flagship.json).

The rules here used to live piecemeal inside training/loop.py and
data/bundle.py; validate() centralizes them so CLIs and presets fail at
load time (VERDICT r4 item 7).
"""

from __future__ import annotations

import json
import os

import pytest

from recnet_tpu.config import TrainConfig

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def test_default_config_validates_clean():
    tc = TrainConfig()
    assert tc.validate() is tc          # returns self for chaining


def test_validate_rejects_unknown_train_precision():
    with pytest.raises(ValueError, match="train_precision"):
        TrainConfig(train_precision="float64").validate()


def test_validate_rejects_unknown_cache_dtype():
    with pytest.raises(ValueError, match="feature_cache_dtype"):
        TrainConfig(feature_cache_dtype="int8").validate()


def test_validate_rejects_nonpositive_steps_per_dispatch():
    # previously coerced to 1 silently — a typo'd 0/-10 trained at k=1
    # with no signal (code review, round 5)
    for bad in (0, -10):
        with pytest.raises(ValueError, match="steps_per_dispatch"):
            TrainConfig(steps_per_dispatch=bad).validate()


def test_validate_cadence_divisibility():
    # 500 % 3 != 0 — same rule train() enforces
    with pytest.raises(ValueError, match="log_every"):
        TrainConfig(steps_per_dispatch=3, log_every=500).validate()
    # all cadences divide -> fine
    TrainConfig(steps_per_dispatch=10).validate()


def test_validate_debug_needs_k1():
    with pytest.raises(ValueError, match="debug"):
        TrainConfig(steps_per_dispatch=10).validate(debug=True)
    TrainConfig(steps_per_dispatch=1).validate(debug=True)


@pytest.mark.parametrize("knob", ["device_feature_cache", "data_bundle"])
def test_validate_cache_and_bundle_require_uniform_sampling(knob):
    with pytest.raises(ValueError, match="uniform"):
        TrainConfig(frame_sampling_method="random",
                    **{knob: True}).validate()
    # uniform sampling is fine
    TrainConfig(frame_sampling_method="uniform", **{knob: True}).validate()


def test_validate_greedy_segment_requires_pallas():
    with pytest.raises(ValueError, match="use_pallas"):
        TrainConfig(greedy_segment=4, use_pallas=False).validate()
    with pytest.raises(ValueError, match="greedy_segment"):
        TrainConfig(greedy_segment=-1, use_pallas=True).validate()
    TrainConfig(greedy_segment=4, use_pallas=True).validate()


def test_validate_warns_on_ineffective_cache_dtype():
    with pytest.warns(UserWarning, match="no effect"):
        TrainConfig(feature_cache_dtype="bfloat16",
                    device_feature_cache=False).validate()


@pytest.mark.parametrize("fname", ["msvd_flagship.json",
                                   "msrvtt_flagship.json"])
def test_flagship_preset_loads_and_validates(fname):
    """The checked-in production presets: one --config flag turns on the
    whole fast path (bundle + bf16 HBM cache + k=10 dispatch + Pallas eval
    with segmented early exit) on the reference's global-recon recipe."""
    with open(os.path.join(EXAMPLES, fname)) as f:
        raw = json.load(f)
    # presets must not pin a run timestamp — each run derives its own id
    assert "timestamp" not in raw
    tc = TrainConfig.from_dict(raw)
    tc.validate()
    assert tc.use_recon and tc.reconstructor_type == "global"
    assert tc.data_bundle and tc.device_feature_cache
    assert tc.feature_cache_dtype == "bfloat16"
    assert tc.steps_per_dispatch == 10
    assert tc.use_pallas and tc.greedy_segment == 4
    # parity knobs stay at reference defaults (README.md:84-88 recipe)
    assert tc.batch_size == 100 and tc.n_iterations == 100000
    assert tc.decoder_learning_rate == 1e-5
    assert tc.train_precision == "float32"
    expect = "MSR-VTT" if "msrvtt" in fname else "MSVD"
    assert tc.corpus == expect


def test_flagship_preset_roundtrips_through_cli_loader():
    """cli.train loads presets via from_json(file) — same path here."""
    with open(os.path.join(EXAMPLES, "msvd_flagship.json")) as f:
        tc = TrainConfig.from_json(f.read())
    # a second dump/load is stable (tuple coercions idempotent)
    tc2 = TrainConfig.from_json(tc.to_json())
    assert tc2.replace(timestamp=tc.timestamp) == tc
