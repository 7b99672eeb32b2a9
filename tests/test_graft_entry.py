"""Driver contract: __graft_entry__.entry and dryrun_multichip stay green."""

import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge


class TestEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert [tuple(o.shape) for o in out] == [(127, 256)] * 4
        for o in out:
            assert np.isfinite(np.asarray(jax.numpy.sum(jax.numpy.abs(o))))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_dryrun_multichip_8(self, capsys):
        ge.dryrun_multichip(8)
        assert "dryrun_multichip ok" in capsys.readouterr().out

    def test_dryrun_multichip_1(self, capsys):
        ge.dryrun_multichip(1)
        assert "dryrun_multichip ok" in capsys.readouterr().out
