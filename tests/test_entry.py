"""Driver contract tests: entry() compiles, dryrun_multichip(8) executes."""

import pytest
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.ndim == 2 and out.shape[0] == 4
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)