"""Command-line entry point: `firecode-tpu input.txt` or
`python -m firecode_tpu input.txt`.

Capability parity with firecode/__main__.py:36-158 (env-var bootstrap,
rc-file overrides, Embedder construction and run).
"""

from __future__ import annotations

import argparse
import sys

from firecode_tpu.settings import apply_env_defaults


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="firecode-tpu",
        description=(
            "TPU-native conformational ensemble engine: embedding, torsion "
            "search, similarity pruning, batched optimization, TS search and "
            "thermochemistry."
        ),
    )
    parser.add_argument("inputfile", nargs="?", help="input .txt file")
    parser.add_argument(
        "-s", "--setup", action="store_true", help="print current settings and exit"
    )
    parser.add_argument("--stamp", default=None, help="override the run stamp")
    parser.add_argument(
        "--cpu", action="store_true", help="force the CPU backend (debugging)"
    )
    parser.add_argument(
        "--resume",
        default=None,
        metavar="STATE.npz",
        help="resume a killed run from a firecode_state_*.npz snapshot",
    )
    args = parser.parse_args(argv)

    apply_env_defaults()

    if args.setup:
        from firecode_tpu.modify_settings import run_setup

        run_setup()
        return

    if args.inputfile is None:
        parser.print_help()
        sys.exit(1)

    import os

    if not os.path.isfile(args.inputfile):
        print(f"Error: input file {args.inputfile!r} not found.")
        sys.exit(1)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from firecode_tpu.driver import Embedder

    embedder = Embedder(args.inputfile, stamp=args.stamp, resume=args.resume)
    embedder.run()


if __name__ == "__main__":
    main()
