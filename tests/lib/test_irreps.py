import pytest

from allegro_tpu.lib import Irrep, Irreps, tp_path_exists


def test_irrep_parse():
    assert Irrep("0e") == Irrep(0, 1)
    assert Irrep("1o") == Irrep(1, -1)
    assert Irrep("2e").dim == 5
    assert Irrep("3o").dim == 7
    with pytest.raises(ValueError):
        Irrep("xx")
    with pytest.raises(ValueError):
        Irrep(1, 0)


def test_irrep_product():
    out = list(Irrep("1o") * Irrep("1o"))
    assert out == [Irrep("0e"), Irrep("1e"), Irrep("2e")]
    out = list(Irrep("1o") * Irrep("2e"))
    assert out == [Irrep("1o"), Irrep("2o"), Irrep("3o")]


def test_irreps_parse_dim():
    irr = Irreps("32x0e+8x1o+4x2e")
    assert irr.dim == 32 + 8 * 3 + 4 * 5
    assert irr.num_irreps == 44
    assert str(irr) == "32x0e+8x1o+4x2e"
    assert Irreps("").dim == 0
    assert Irreps("0e+1o") == Irreps([(1, "0e"), (1, "1o")])


def test_irreps_slices():
    irr = Irreps("2x0e+1x1o")
    s = irr.slices()
    assert s == [slice(0, 2), slice(2, 5)]


def test_irreps_sh():
    irr = Irreps.spherical_harmonics(3)
    assert str(irr) == "1x0e+1x1o+1x2e+1x3o"
    irr = Irreps.spherical_harmonics(2, p=1)
    assert str(irr) == "1x0e+1x1e+1x2e"


def test_irreps_ops():
    irr = Irreps("1x0e+1x0e+2x1o")
    assert str(irr.merged()) == "2x0e+2x1o"
    assert Irreps("1x1o+1x0e").sorted() == Irreps("1x0e+1x1o")
    assert Irreps("4x0e").repeat(3) == Irreps("12x0e")
    assert irr.count("0e") == 2
    assert "1o" in irr
    assert "2e" not in irr


def test_tp_path_exists():
    assert tp_path_exists("1x1o", "1x1o", "0e")
    assert tp_path_exists("1x1o", "1x1o", "2e")
    assert not tp_path_exists("1x1o", "1x1o", "1o")  # parity forbids
    assert tp_path_exists("1x1o", "1x1e", "1o")
    assert not tp_path_exists("1x0e", "1x0e", "1o")
