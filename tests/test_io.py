import numpy as np
import pytest

from firecode_tpu.errors import InputError
from firecode_tpu.io.xyz import parse_energy, parse_xyz, write_xyz


def test_scientific_notation_coordinates():
    atoms, coords, _ = parse_xyz("1\nc\nC 1.5e-3 -2E+1 0.0\n")
    np.testing.assert_allclose(coords[0, 0], [1.5e-3, -20.0, 0.0])


def test_windows_line_endings():
    atoms, coords, comments = parse_xyz("2\r\nhello\r\nC 0 0 0\r\nH 1 0 0\r\n")
    assert atoms == ["C", "H"]
    assert coords.shape == (1, 2, 3)


def test_blank_lines_between_frames():
    text = "1\na\nC 0 0 0\n\n\n1\nb\nC 1 1 1\n"
    atoms, coords, comments = parse_xyz(text)
    assert coords.shape == (2, 1, 3)


def test_extra_columns_ignored():
    # some programs append gradient/charge columns after xyz
    atoms, coords, _ = parse_xyz("1\nc\nO 1.0 2.0 3.0 0.123 0.5\n")
    np.testing.assert_allclose(coords[0, 0], [1.0, 2.0, 3.0])


def test_parse_energy_units():
    assert parse_energy("-76.43") == -76.43
    assert parse_energy("E = -76.43 Eh extra") == -76.43
    kcal = parse_energy("-100.0 kcal/mol")
    assert abs(kcal + 100.0 / 627.5096080305927) < 1e-9
    assert parse_energy("no numbers here") is None


def test_negative_atom_count_rejected():
    with pytest.raises(InputError):
        parse_xyz("-3\nc\nC 0 0 0\n")


def test_large_roundtrip(tmp_path, rng):
    coords = rng.normal(size=(50, 30, 3)) * 10
    atoms = ["C"] * 15 + ["H"] * 15
    write_xyz(tmp_path / "big.xyz", atoms, coords)
    a2, c2, _ = parse_xyz((tmp_path / "big.xyz").read_text())
    assert a2 == atoms
    np.testing.assert_allclose(c2, coords, atol=1e-7)
