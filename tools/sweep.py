"""Programmatic experiment sweeps (reference: dict_to_flags, utils.py:476-480).

Example:
    python tools/sweep.py --driver mnist --grid '{"beta": [0.001, 0.01], "seed": [0, 1]}' \
        --base '{"elbo": "SVGPVAE_Hensman", "opt_regime": "joint-2", "eval_every": 2}'

Runs the cartesian product of `grid` over the chosen driver, one process per
config, streaming each run's tail to stdout.
"""

from __future__ import annotations

import argparse
import itertools
import json
import subprocess
import sys


def flag_args(d: dict) -> list:
    out = []
    for k, v in d.items():
        if isinstance(v, bool):
            if v:
                out.append(f"--{k}")
        else:
            out.extend([f"--{k}", *str(v).split()])
    return out


def main() -> None:
    p = argparse.ArgumentParser(description="experiment sweep runner")
    p.add_argument("--driver", choices=["ball", "mnist", "sprites"],
                   required=True)
    p.add_argument("--grid", type=json.loads, required=True,
                   help='JSON dict of flag -> list of values')
    p.add_argument("--base", type=json.loads, default={},
                   help="JSON dict of fixed flags")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    keys = list(args.grid)
    for combo in itertools.product(*(args.grid[k] for k in keys)):
        cfg = dict(args.base, **dict(zip(keys, combo)))
        cmd = [sys.executable, "-m", f"svgpvae_tpu.cli.{args.driver}",
               *flag_args(cfg)]
        print("::", " ".join(cmd), flush=True)
        if not args.dry_run:
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
