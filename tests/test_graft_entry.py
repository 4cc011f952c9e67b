"""Driver entry points must keep compiling and executing."""

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    logits, spins, recon = jax.jit(fn)(*args)
    assert logits.shape == (128, 256)
    assert spins.shape == (128, 8, 256)
    assert recon.shape == (128, 8, 32, 32, 1)
    assert np.isfinite(np.asarray(recon)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)  # raises on any failure
