"""Cross-process host-data exchange for distributed eval.

Reference equivalent: the reference family had NO distributed eval merge —
each worker wrote its shard's detections to disk and rank 0 (or the user)
concatenated them before COCOeval (SURVEY.md §2.1 row 5 "dist eval").
Here the merge is in-process: arbitrary picklable host objects are exchanged
through a padded-uint8 ``process_allgather`` (two collectives: lengths, then
payload), so every process ends with the full detection set and computes
identical global metrics — no filesystem rendezvous, no rank-0 special case.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax


def all_gather_objects(obj) -> list:
    """Gather one picklable object per process; returns [obj_p0, obj_p1, ...].

    Single-process: returns [obj] without touching collectives, so the same
    call sites work in tests and on a pod.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(
        multihost_utils.process_allgather(np.asarray(len(data), np.int64)))
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[: len(data)] = data
    rows = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(rows[i, : int(lens[i])].tobytes())
            for i in range(rows.shape[0])]
