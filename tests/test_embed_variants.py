import numpy as np
import pytest
from types import SimpleNamespace

from firecode_tpu.embed import Hypermolecule
from firecode_tpu.embed.embeds import cyclical_embed, multiembed_dispatcher
from tests.test_embed import ETHENE, ETHENE_Z, _embedder, _options

# SO2-like bent molecule for chelotropic embeds (single reactive S)
SO2_Z = np.array([16, 8, 8], dtype=np.int32)
SO2 = np.array(
    [
        [0.0, 0.0, 0.0],
        [1.43, 0.0, 0.3],
        [-1.43, 0.0, 0.3],
    ]
)

# butadiene (s-cis), reactive terminal carbons
BUTADIENE_Z = np.array([6, 6, 6, 6, 1, 1, 1, 1, 1, 1], dtype=np.int32)
BUTADIENE = np.array(
    [
        [0.000, 0.000, 0.0],
        [1.340, 0.000, 0.0],
        [2.075, 1.273, 0.0],
        [3.415, 1.273, 0.0],
        [-0.56, -0.92, 0.0],
        [-0.56, 0.92, 0.0],
        [1.90, -0.92, 0.0],
        [1.545, 2.193, 0.0],
        [3.975, 0.353, 0.0],
        [3.945, 2.193, 0.0],
    ]
)


def test_chelotropic_embed():
    """SO2 (1 reactive atom) + ethene (2 reactive atoms)."""
    so2 = Hypermolecule(atomnos=SO2_Z, coords=SO2, reactive_indices=[0], name="so2")
    eth = Hypermolecule(
        atomnos=ETHENE_Z, coords=ETHENE, reactive_indices=[0, 1], name="eth"
    )
    # chelotropic: pivots on the single S atom from its lobe pairs
    steps = 2
    grid = np.stack(
        np.meshgrid(*[np.arange(steps + 1)] * 2, indexing="ij"), -1
    ).reshape(-1, 2)
    angles = grid * 2 * 90 / steps - 90
    emb = _embedder([so2, eth], list(angles))
    assert len(so2.pivots[0]) >= 1  # S lobes pair with themselves
    poses = cyclical_embed(emb)
    assert poses.shape[1:] == (9, 3)
    assert len(poses) >= 1


def test_trimolecular_embed():
    # butadiene termini give ~3.6 A pivots: a buildable triangle
    mols = [
        Hypermolecule(
            atomnos=BUTADIENE_Z, coords=BUTADIENE, reactive_indices=[0, 3], name=f"bd{k}"
        )
        for k in range(3)
    ]
    steps = 1
    grid = np.stack(
        np.meshgrid(*[np.arange(steps + 1)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    angles = grid * 2 * 45 / steps - 45
    emb = _embedder(mols, list(angles))
    # small molecules around a tight triangle: relax the clash threshold,
    # we are testing the machinery here
    emb.options.clash_thresh = 0.7
    poses = cyclical_embed(emb)
    assert poses.shape[1:] == (30, 3)
    assert len(poses) >= 1
    # three constraint pairs per pose (triangle closure)
    assert emb.constrained_indices.shape[1] == 3


def test_multiembed_dispatcher():
    """Butadiene with 4 reactive atoms x ethene with 2: arrangements."""
    bd = Hypermolecule(
        atomnos=BUTADIENE_Z, coords=BUTADIENE, reactive_indices=[0, 1, 2, 3], name="bd"
    )
    eth = Hypermolecule(
        atomnos=ETHENE_Z, coords=ETHENE, reactive_indices=[0, 1], name="eth"
    )
    steps = 1
    grid = np.stack(
        np.meshgrid(*[np.arange(steps + 1)] * 2, indexing="ij"), -1
    ).reshape(-1, 2)
    angles = grid * 2 * 45 / steps - 45
    emb = _embedder([bd, eth], list(angles))
    poses = multiembed_dispatcher(emb)
    assert poses.shape[1:] == (16, 3)
    assert len(poses) >= 1
    assert len(emb.constrained_indices) == len(poses)


def test_multiembed_through_driver(tmp_path, rng):
    """Full driver run dispatching to multiembed (>=2 reactive centers each,
    not a plain cyclical setup)."""
    import os

    import pytest as _pytest

    from firecode_tpu.io.xyz import write_xyz
    from firecode_tpu.pt import symbols_from_atomnos

    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        write_xyz(tmp_path / "bd.xyz", symbols_from_atomnos(BUTADIENE_Z), BUTADIENE)
        write_xyz(tmp_path / "eth.xyz", symbols_from_atomnos(ETHENE_Z), ETHENE)
        (tmp_path / "input.txt").write_text(
            "STEPS=1 KCAL=50\nbd.xyz 0 1 2 3\neth.xyz 0 1\n"
        )
        from firecode_tpu.driver import Embedder

        with _pytest.raises(SystemExit) as exc:
            emb = Embedder(str(tmp_path / "input.txt"), stamp="me")
            assert emb.embed == "multiembed"
            emb.run()
        assert exc.value.code == 0
        assert (tmp_path / "firecode_final_ensemble_me.xyz").exists()
    finally:
        os.chdir(old)
