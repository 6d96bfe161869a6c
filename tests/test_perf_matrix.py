"""perf_matrix CLI plumbing (numbers need a real TPU; --tiny smokes fwd)."""

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "perf_matrix", os.path.join(ROOT, "scripts", "perf_matrix.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tiny_fwd_runs(capsys):
    _load().main(["fwd", "--tiny", "--iters", "1", "--repeats", "1",
                  "--batch", "1", "--attn", "xla", "--dtypes", "bfloat16"])
    out = capsys.readouterr().out
    assert "ms/forward" in out and "FAILED" not in out


def test_tiny_eval_runs(capsys):
    _load().main(["eval", "--tiny", "--iters", "1", "--repeats", "1",
                  "--batch", "1"])
    out = capsys.readouterr().out
    assert "derived CRF share" in out and "FAILED" not in out
