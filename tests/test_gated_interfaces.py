"""External-engine escape hatches must fail actionably when binaries are
absent (they are absent in this environment)."""

import numpy as np
import pytest
from types import SimpleNamespace

from firecode_tpu.errors import MissingExternalError
from tests.test_calculator_opt import WATER, WATER_Z


def _stub_embedder(mol):
    return SimpleNamespace(
        objects=[mol],
        options=SimpleNamespace(
            let=False, crestlevel=None, nci=False, solvent=None, max_confs=10
        ),
        pairings_dict={0: {}},
        log=lambda s, p=True: None,
    )


def _water_mol():
    from firecode_tpu.embed import Hypermolecule

    return Hypermolecule(atomnos=WATER_Z, coords=WATER, name="water.xyz")


def test_xtb_gate():
    from firecode_tpu.calculators.xtb_io import xtb_energy_and_gradient

    with pytest.raises(MissingExternalError, match="xtb binary not found"):
        xtb_energy_and_gradient(WATER_Z, WATER)


def test_crest_gate():
    from firecode_tpu.interfaces.crest import crest_mtd_search

    with pytest.raises(MissingExternalError, match="csearch"):
        crest_mtd_search("water.xyz", _stub_embedder(_water_mol()))


def test_goat_gate():
    from firecode_tpu.interfaces.goat import goat_search

    with pytest.raises(MissingExternalError, match="csearch"):
        goat_search("water.xyz", _stub_embedder(_water_mol()))


def test_rdkit_gate():
    from firecode_tpu.rdkit_tools import smiles_to_3d

    with pytest.raises(MissingExternalError, match="rdkit"):
        smiles_to_3d("CCO")


def test_dispatcher_unknown_calculator():
    from firecode_tpu.calculators.dispatcher import Dispatcher

    with pytest.raises(SyntaxError, match="not a recognized calculator"):
        Dispatcher("MAGIC")


def test_tblite_gate():
    """TBLITE routes to the gated tblite loader (reference dispatcher.py:187-260)."""
    import numpy as np

    from firecode_tpu.calculators.dispatcher import Dispatcher

    try:
        import tblite  # noqa: F401

        pytest.skip("tblite installed: gate not exercised")
    except ImportError:
        pass
    atomnos = np.array([8, 1, 1])
    coords = np.zeros((3, 3))
    with pytest.raises(MissingExternalError, match="GFNFF"):
        Dispatcher("TBLITE").get_batch_calc(atomnos, coords)
