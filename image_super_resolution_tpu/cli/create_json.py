"""Manifest builder CLI — flag parity with reference create_json.py:6-10
(``--train_dirs``, ``--val_dirs``, ``--shape`` as the min size)."""

from __future__ import annotations

import argparse

from ..data.manifest import create_data_lists


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Build train/val image manifests")
    parser.add_argument("--train_dirs", type=str, nargs="+", default=[])
    parser.add_argument("--val_dirs", type=str, nargs="+", default=[])
    parser.add_argument("--shape", type=int, default=96, help="minimum image size")
    parser.add_argument("--output", type=str, default="./")
    parser.add_argument("--verbose", action="store_true")
    return parser


def main(argv=None) -> None:
    opt = build_parser().parse_args(argv)
    create_data_lists(
        train_folders=opt.train_dirs,
        val_folders=opt.val_dirs,
        min_size=opt.shape,
        output_folder=opt.output,
        verbose=opt.verbose,
    )


if __name__ == "__main__":
    main()
