"""Run-directory layout + args dump (SURVEY.md §5.4).

Mirrors the reference's run-folder convention (make_checkpoint_folder,
utils.py:377-433): a unique timestamped directory with pics/, res/, preds/
subfolders, a snapshot of the framework source under sourcecode/, and an
args.json of the full flag set (MNIST_experiment.py:56).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime
from pathlib import Path
from typing import Optional


def make_checkpoint_folder(base_dir: str, expid: Optional[str] = None,
                           extra: str = "",
                           snapshot_source: bool = True) -> str:
    """Create <base>/<expid>/<N>_<extra>__on__<timestamp>/{pics,res,preds,
    sourcecode,ckpt} and snapshot the package source."""
    base = Path(base_dir)
    if expid is not None:
        base = base / expid
    base.mkdir(parents=True, exist_ok=True)

    now = datetime.now()
    stamp = (f"{now.day}_{now.month}_{now.year}__at__"
             f"{now.hour}_{now.minute}_{now.second}")
    run_dir = base / f"{len(os.listdir(base))}_{extra}__on__{stamp}"
    for sub in ("pics", "res", "preds", "ckpt"):
        (run_dir / sub).mkdir(parents=True)

    if snapshot_source:
        src_root = Path(__file__).resolve().parent.parent
        dst = run_dir / "sourcecode"
        shutil.copytree(src_root, dst / src_root.name,
                        ignore=shutil.ignore_patterns("__pycache__"))
    return str(run_dir) + "/"


def dump_args(run_dir: str, args) -> None:
    """Serialize the experiment flags to args.json (reference:
    MNIST_experiment.py:56)."""
    args_dict = vars(args) if not isinstance(args, dict) else args
    with open(Path(run_dir) / "args.json", "w") as f:
        json.dump(args_dict, f, indent=2, default=str)
