"""Logging and artifact IO.

The artifact *schema* (file names, folder layout, .pt logits tensors) is the
reference pipeline's de-facto persistence API (SURVEY.md §1); we preserve it
so the results aggregator and plotting stages consume either implementation's
outputs interchangeably.
"""
from __future__ import annotations

import os

import numpy as np


class IOStream:
    """Tee logger (reference tools/final_util.py:90-100).

    Usable as a context manager so stage code can't leak the fd when the
    wrapped work raises (ADVICE r4).  ``mode="w"`` truncates: per-sample
    stage logs are rewritten whole on every (re)run, so appending would
    leave stale StageTimer lines that parse_stage_timers averages in.
    """

    def __init__(self, path: str, mode: str = "a"):
        self.f = open(path, mode)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def cprint(self, text: str):
        print(text)
        self.f.write(text + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


def mkdir(path: str):
    os.makedirs(path, exist_ok=True)


def save_npy(path: str, arr):
    np.save(path, np.asarray(arr))


def load_npy(path: str):
    return np.load(path)


def save_torch_tensor(path: str, arr):
    """Save a numpy array as a torch tensor .pt file for byte compatibility
    with the reference's `torch.save(all_logits, ...)` artifacts
    (tools/final_common.py:170).  Torch (CPU) is an IO dependency only —
    no compute runs through it.
    """
    import torch
    torch.save(torch.from_numpy(np.asarray(arr)), path)


def load_torch_tensor(path: str):
    import torch
    return torch.load(path, map_location="cpu").numpy()


def snapshot_sources(exp_dir: str, modules) -> list:
    """Copy the source files of `modules` into ``exp_dir`` as ``*.backup`` —
    the reference's poor-man's provenance system (main_cls_seed.py:30-33:
    the driver, model, util and data sources are snapshotted next to every
    checkpoint so a run can always be traced to the code that produced it).

    Args:
      modules: imported module objects (or anything with ``__file__``).
    Returns: list of written paths.
    """
    import shutil

    mkdir(exp_dir)
    written = []
    for mod in modules:
        src = getattr(mod, "__file__", None)
        if not src or not os.path.exists(src):
            continue
        dst = os.path.join(exp_dir, os.path.basename(src) + ".backup")
        shutil.copyfile(src, dst)
        written.append(dst)
    return written
