from firecode_tpu.io.xyz import read_xyz, read_xyz_energies, write_xyz

__all__ = ["read_xyz", "read_xyz_energies", "write_xyz"]
