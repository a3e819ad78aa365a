"""Command-line interface.

The reference's only runtime knob is an OpenMP thread count
(``./cbet-gpu [threads]``, main.cu:236-242) with everything else fixed at
compile time (def.cuh).  Here every def.cuh parameter is a flag; subcommands:

* ``run``    — full simulation (optionally with the CBET stage)
* ``dump``   — reference-compatible -D PRINT text dump to stdout
                (Makefile:14-17 golden-test replacement)

(The benchmark harness is top-level ``bench.py`` — the driver contract.)

Usage examples::

    python -m cbet_raytracing_3d_tpu.cli run --nbeams 60 --out-dir out \
        --formats npz,hdf5,json
    python -m cbet_raytracing_3d_tpu.cli run --cbet --nbeams 4
    python -m cbet_raytracing_3d_tpu.cli dump > edep.txt
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from .config import Config
from .runner import run, write_outputs
from .utils.output import dump_print_format


def _add_config_flags(p: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        name = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=f.default, metavar="BOOL")
        elif isinstance(f.default, int):
            p.add_argument(name, type=int, default=f.default)
        elif isinstance(f.default, float):
            p.add_argument(name, type=float, default=f.default)
        else:
            p.add_argument(name, type=str, default=f.default)


def config_from_args(args: argparse.Namespace) -> Config:
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(Config)}
    return Config(**kw)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="cbet-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="full simulation")
    _add_config_flags(p_run)
    p_run.add_argument("--cbet", action="store_true",
                       help="run the CBET gain stage")
    p_run.add_argument("--out-dir", default="out")
    p_run.add_argument("--formats", default="npz,json",
                       help="comma list: npz,hdf5,txt,json")
    p_run.add_argument("--quiet", action="store_true")
    p_run.add_argument("--profile-dir", default=None,
                       help="capture a jax.profiler trace of the Tracing phase")
    p_run.add_argument("--cache-dir", default=".cbet_cache",
                       help="prepare-products / tile-plan cache directory "
                            "('' disables)")

    p_dump = sub.add_parser("dump", help="-D PRINT compatible dump to stdout")
    _add_config_flags(p_dump)

    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    # persistent executable cache across processes (reference analog: nvcc
    # compiles once at build time, Makefile:11-12); env-gated, see module
    from .utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    if args.cmd == "run":
        res = run(cfg, with_cbet=args.cbet, verbose=not args.quiet,
                  profile_dir=args.profile_dir,
                  cache_dir=args.cache_dir or None)
        paths = write_outputs(res, args.out_dir,
                              tuple(args.formats.split(",")))
        if not args.quiet:
            print(json.dumps(res.stats, indent=2))
            for p in paths:
                print(f"wrote {p}", file=sys.stderr)
        return 0

    if args.cmd == "dump":
        res = run(cfg, verbose=False)
        sys.stdout.write(dump_print_format(res.edep))
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
