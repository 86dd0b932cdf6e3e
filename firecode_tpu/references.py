"""Literature references auto-printer.

Capability parity with firecode/references.py + the feature-based citation
selection (firecode/embedder.py:312-349).
"""

from __future__ import annotations

references: dict[str, str] = {
    "FIRECODE-TPU": (
        "firecode_tpu: a TPU-native conformational ensemble engine "
        "(JAX/XLA), https://github.com/ (this work)"
    ),
    "QCP": (
        "Theobald, D. L. Acta Crystallogr. A 2005, 61, 478-480 "
        "(quaternion characteristic polynomial RMSD)"
    ),
    "FIRE": (
        "Bitzek, E. et al. Phys. Rev. Lett. 2006, 97, 170201 "
        "(FIRE optimization)"
    ),
    "NEB-CI": (
        "Henkelman, G.; Uberuaga, B. P.; Jonsson, H. J. Chem. Phys. 2000, "
        "113, 9901-9904 (climbing-image NEB)"
    ),
    "QRRHO": (
        "Grimme, S. Chem. Eur. J. 2012, 18, 9955-9964 "
        "(quasi-RRHO entropy)"
    ),
    "UFF": (
        "Rappe, A. K. et al. J. Am. Chem. Soc. 1992, 114, 10024-10035 "
        "(UFF nonbonded parameters)"
    ),
    "QEQ": (
        "Rappe, A. K.; Goddard, W. A. J. Phys. Chem. 1991, 95, 3358-3363 "
        "(charge equilibration)"
    ),
    "GB": (
        "Still, W. C. et al. J. Am. Chem. Soc. 1990, 112, 6127-6129 "
        "(Generalized Born solvation)"
    ),
    "GFNFF": (
        "Spicher, S.; Grimme, S. Angew. Chem. Int. Ed. 2020, 59, 15665 "
        "(GFN-FF term structure; parameters re-derived in-repo, see "
        "calculators/gfnff/params.py)"
    ),
    "XTB": (
        "Bannwarth, C. et al. WIREs Comput. Mol. Sci. 2021, 11, e1493 "
        "(xtb external engine)"
    ),
    "CREST": (
        "Pracht, P. et al. J. Chem. Phys. 2024, 160, 114110 "
        "(CREST external engine)"
    ),
    "PAULING": (
        "Pauling, L. J. Am. Chem. Soc. 1932, 54, 3570-3582 "
        "(electronegativity bond-energy correction, LiteFF-R pair depths)"
    ),
    "SW-FREESPACE": (
        "Shakhnovich, E. I.; Whitesides, G. M. J. Org. Chem. 1998, 63, "
        "3821-3830 (solution free-space translational entropy)"
    ),
    "BERENDSEN": (
        "Berendsen, H. J. C. et al. J. Chem. Phys. 1984, 81, 3684-3690 "
        "(pressure coupling)"
    ),
    "SCHNET": (
        "Schuett, K. T. et al. J. Chem. Phys. 2018, 148, 241722 "
        "(continuous-filter convolutions, MLIP interaction layer)"
    ),
    "IDPP": (
        "Smidstrup, S. et al. J. Chem. Phys. 2014, 140, 214106 "
        "(image-dependent pair potential interpolation)"
    ),
}


def references_for_options(options) -> list[str]:
    """Select citations based on the features a run uses."""
    used = ["FIRECODE-TPU", "QCP", "FIRE"]
    if options.calculator == "GFNFF":
        used += ["GFNFF", "QEQ", "PAULING"]
    if options.calculator == "LITEFF":
        used.append("UFF")
    if options.calculator == "LITEFF-R":
        used += ["UFF", "QEQ", "PAULING"]
    if options.calculator == "MLIP":
        used.append("SCHNET")
    if options.calculator in ("XTB", "TBLITE"):
        used.append("XTB")
    if options.solvent is not None:
        used += ["QEQ", "GB"]
    if any("neb" in op for op in options.operators) or options.neb:
        used += ["NEB-CI", "IDPP"]
    if options.freq or any("freq" in op for op in options.operators):
        used.append("QRRHO")
        if options.P is None and options.solvent is not None:
            # the free-space correction only runs for the solution reference
            # state (thermo.translational_entropy uses C only when P is None)
            used.append("SW-FREESPACE")
    if any("equilibrate" in op for op in options.operators):
        used.append("BERENDSEN")
    if any(("mtd" in op or "crest" in op) for op in options.operators):
        used.append("CREST")
    if any("mtd_native" in op for op in options.operators):
        used.append("GFNFF")  # the default MTD surface; MTD form follows CREST

    return [references[k] for k in dict.fromkeys(used)]
