"""Optional experiment-tracker hook (reference wandb, train.py:1297-1305):
no-ops when the library is absent, mirrors metrics when present."""

import sys
import types

from zett_tpu.utils.tracking import NullTracker, build_tracker


def test_null_tracker_default():
    for kind in (None, "none"):
        t = build_tracker(kind)
        assert isinstance(t, NullTracker)
        t.log(1, {"loss": 1.0})
        t.finish()


def test_missing_libraries_fall_back_to_null(tmp_path):
    # wandb is not installed in this environment
    assert "wandb" not in sys.modules
    t = build_tracker("wandb")
    assert isinstance(t, NullTracker)
    # torch may provide tensorboard's SummaryWriter; either outcome is fine,
    # the call must simply not raise
    t = build_tracker("tensorboard", log_dir=str(tmp_path))
    t.log(1, {"loss": 1.0})
    t.finish()


def test_fake_wandb_receives_numeric_metrics(monkeypatch):
    calls = []
    fake = types.SimpleNamespace(
        init=lambda name=None, config=None: calls.append(("init", name, config)),
        log=lambda metrics, step=None: calls.append(("log", metrics, step)),
        finish=lambda: calls.append(("finish",)),
    )
    monkeypatch.setitem(sys.modules, "wandb", fake)
    t = build_tracker("wandb", run_name="myrun", config={"lr": 1e-3})
    t.log(7, {"loss": 0.5, "lang_code": "en", "step": 7})
    t.finish()
    assert calls[0] == ("init", "myrun", {"lr": 1e-3})
    # non-numeric values are filtered before forwarding
    assert calls[1] == ("log", {"loss": 0.5, "step": 7}, 7)
    assert calls[-1] == ("finish",)


def test_fake_tensorboard_writer(monkeypatch, tmp_path):
    scalars = []

    class FakeWriter:
        def __init__(self, log_dir):
            self.log_dir = log_dir

        def add_scalar(self, k, v, global_step=None):
            scalars.append((k, v, global_step))

        def flush(self):
            pass

        def close(self):
            scalars.append(("closed",))

    fake_mod = types.SimpleNamespace(SummaryWriter=FakeWriter)
    monkeypatch.setitem(sys.modules, "tensorboardX", fake_mod)
    # force the torch path to miss so the tensorboardX fallback is used
    monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", None)
    t = build_tracker("tensorboard", log_dir=str(tmp_path))
    t.log(3, {"loss": 2.5, "lang_code": "de"})
    t.finish()
    assert ("loss", 2.5, 3) in scalars
    assert ("closed",) in scalars
    assert not any(s[0] == "lang_code" for s in scalars if len(s) == 3)


def test_unknown_kind_raises():
    import pytest

    with pytest.raises(ValueError):
        build_tracker("mlflow")
