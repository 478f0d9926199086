"""Experiment-management helpers (rebuild of Theano_classifier/utils.py)."""

import json
import os

import numpy as np
import pytest

from ctgan_tpu.utils import MetricLogger, load_checkpoint
from ctgan_tpu.utils.experiments import (
    AttributeDict,
    BestParamSaver,
    filter_funcs_prefix,
    load_exp_params,
    load_log,
    prepare_dir,
    save_exp_params,
    short_format,
)


def test_attribute_dict():
    d = AttributeDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    with pytest.raises(AttributeError):
        _ = d.missing


def test_prepare_dir_increments(tmp_path):
    a = prepare_dir("exp", results_dir=str(tmp_path))
    b = prepare_dir("exp", results_dir=str(tmp_path))
    assert a.endswith("exp0") and b.endswith("exp1")
    assert os.path.isdir(a) and os.path.isdir(b)


def test_best_param_saver_tracks_minimum(tmp_path):
    s = BestParamSaver(str(tmp_path), minimize=True)
    assert s.update(0.5, {"w": np.zeros(2)})
    assert not s.update(0.7, {"w": np.ones(2)})   # worse: snapshot kept
    assert s.update(0.2, {"w": np.full(2, 3.0)})  # new best
    path = s.save()
    got = load_checkpoint(path)
    np.testing.assert_array_equal(got["w"], np.full(2, 3.0))
    assert s.best_value == 0.2


def test_best_param_saver_untracked_saves_latest(tmp_path):
    s = BestParamSaver(str(tmp_path), track=False)
    s.update(None, {"w": np.zeros(1)})
    s.update(None, {"w": np.ones(1)})
    got = load_checkpoint(s.save())
    np.testing.assert_array_equal(got["w"], np.ones(1))


def test_exp_params_roundtrip(tmp_path):
    p = {"lr": np.float32(3e-4), "dims": np.arange(3), "name": "x"}
    save_exp_params(str(tmp_path), p)
    back = load_exp_params(str(tmp_path))
    assert back.name == "x" and back.dims == [0, 1, 2]
    assert abs(back.lr - 3e-4) < 1e-9


def test_load_log_columns_from_metric_logger(tmp_path):
    lg = MetricLogger(str(tmp_path))
    lg.plot("err", 0.5)
    lg.tick()
    lg.flush()
    lg.plot("err", 0.25)
    lg.plot("extra", 1.0)
    lg.tick()
    lg.flush()
    cols = load_log(str(tmp_path))
    assert cols["err"] == [0.5, 0.25]
    assert np.isnan(cols["extra"][0]) and cols["extra"][1] == 1.0


def test_short_format_skips_missing_channels():
    row = {"train_err": 0.1234, "cost": 2.5}
    msg = short_format(3, 120, row, {"E": ["train_err", "test_err"],
                                     "C": "cost", "skip": "absent",
                                     "none": None})
    assert msg.startswith("e 3, i 120: ")
    assert "E 0.123" in msg and "C 2.5" in msg and "skip" not in msg


def test_filter_funcs_prefix():
    d = {"cmd_train": 1, "other": 2, "x_cmd_eval": 3}
    out = filter_funcs_prefix(d)
    assert out == {"train": 1, "eval": 3}
    assert filter_funcs_prefix(d, "x_") == {"cmd_eval": 3}
