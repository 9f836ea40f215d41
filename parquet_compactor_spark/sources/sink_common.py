"""Shared commit-time policy for the custom Python DataSource sinks.

One implementation of the overwrite truncation sweep, so the jsonl and
avro sinks (and any future format) cannot drift apart — round 7's TOCTOU
hardening and fresh-foreign-tmp gap each had to be fixed twice before
this existed.
"""

from __future__ import annotations

import os
import shutil
import time


def truncate_for_overwrite(
    path: str, own_tmps: set[str], litter_age_s: float = 3600.0
) -> None:
    """Clear ``path`` for an overwrite commit, Spark-file-sink style.

    Policy (identical for every sink format):

    - stale ``*.tmp`` litter — ANY format's suffix, hidden or not — older
      than ``litter_age_s`` and not this job's own is crashed-job debris:
      reclaimed;
    - every other ``*.tmp`` is spared: this job's own staged files, and
      any fresh tmp that may belong to a concurrent LIVE job — of THIS
      format or any other (deleting it would crash that job's commit
      renames; the age gate, not the suffix, is what distinguishes
      litter from live staging);
    - hidden entries (``_``/``.`` prefixed) other than ``_SUCCESS`` are
      spared — other sinks' staging/metadata class;
    - everything else goes, including data files a previous job wrote in
      another format and subdirectories — matching the whole-directory
      truncation Spark's built-in file sinks perform on overwrite.

    The ``os.listdir`` snapshot races with concurrent jobs (a live
    writer's commit renames its staged tmp away mid-sweep); vanished
    entries are simply done, never an error.
    """
    cutoff = time.time() - litter_age_s
    for name in os.listdir(path):
        full = os.path.join(path, name)
        try:
            is_tmp = name.endswith(".tmp")
            stale_tmp = (
                is_tmp
                and name not in own_tmps
                and os.path.getmtime(full) < cutoff
            )
            if stale_tmp:
                # Stage DIRECTORIES named *.tmp (hadoop/fsspec-style
                # sinks) are litter too — rmtree, not remove.
                if os.path.isdir(full):
                    shutil.rmtree(full)
                else:
                    os.remove(full)
                continue
            if is_tmp:
                continue  # own or possibly-live staging: spare
            if name.startswith(("_", ".")) and name != "_SUCCESS":
                continue  # other sinks' staging/metadata: spare
            if os.path.isdir(full):
                shutil.rmtree(full)
            else:
                os.remove(full)
        except FileNotFoundError:
            pass
