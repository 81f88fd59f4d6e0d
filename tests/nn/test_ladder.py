"""Irreps-ladder regression tests: forward allowed-set construction and
backward pruning, hand-derived (reference semantics: ``_allegro.py:112-154``)."""

from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.nn.allegro import compute_irreps_ladder


def _parity_allowed(l_max):
    return Irreps([(1, (l, p)) for l in range(l_max + 1) for p in (1, -1)])


def test_lmax1_two_layers():
    sh = Irreps.spherical_harmonics(1)  # 0e+1o
    lad = compute_irreps_ladder(sh, _parity_allowed(1), 2)
    # layer0 out: from (0e+1o)⊗(0e+1o): 0e ✓, 0o ✗ (no path), 1e ✓(1o⊗1o), 1o ✓
    # backward prune vs final 0e: 1e⊗{0e,1o} ∌ 0e → 1e pruned
    assert str(lad[0]) == "1x0e+1x1o"
    assert str(lad[1]) == "1x0e+1x1o"
    assert str(lad[2]) == "1x0e"


def test_lmax2_three_layers_keeps_mixed_parity():
    sh = Irreps.spherical_harmonics(2)  # 0e+1o+2e
    lad = compute_irreps_ladder(sh, _parity_allowed(2), 3)
    # with 3 layers, middle layers can afford parity-mixed irreps (1e, 2o)
    # layer0 out (unpruned): 0e,1e,1o,2e,2o — 0o impossible from sh⊗sh
    assert "1e" in str(lad[1]) and "2o" in str(lad[1])
    assert "0o" not in str(lad[1])
    # second-to-last keeps only irreps that reach 0e: exactly the SH parities
    assert str(lad[2]) == "1x0e+1x1o+1x2e"
    assert str(lad[3]) == "1x0e"


def test_parity_off_ladder():
    sh = Irreps("1x0e+1x1e+1x2e")  # parity=False mode
    allowed = sh
    lad = compute_irreps_ladder(sh, allowed, 2)
    for step in lad:
        assert all(mi.ir.p == 1 for mi in step)
    assert str(lad[-1]) == "1x0e"


def test_scalars_always_first():
    sh = Irreps.spherical_harmonics(3)
    lad = compute_irreps_ladder(sh, _parity_allowed(3), 3)
    for step in lad[1:]:
        assert step[0].ir.l == 0 and step[0].ir.p == 1
