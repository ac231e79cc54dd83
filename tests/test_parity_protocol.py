"""The data-readiness parity protocol (scripts/parity_7scenes.py) must
not rot: both the 7-Scenes and Cambridge --dryrun branches run the full
port→render→pose-eval pipeline on miniature on-disk replicas (VERDICT
r3 #4). Slow (~2 min each on the CPU backend) but it is the only
executable check of the real-data protocol."""
import importlib.util
import os.path as osp
import sys

import pytest

_SCRIPT = osp.join(osp.dirname(__file__), "..", "scripts",
                   "parity_7scenes.py")


def _load():
    spec = importlib.util.spec_from_file_location("parity_7scenes", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["parity_7scenes"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("dataset_type", ["7Scenes", "Cambridge"])
def test_parity_dryrun(dataset_type, capsys):
    mod = _load()
    mod.main(["--dryrun", "--dataset_type", dataset_type,
              "--max_render_views", "2"])
    out = capsys.readouterr().out
    assert "PARITY PROTOCOL COMPLETE" in out
    assert "mean test PSNR" in out
    assert "median error" in out
