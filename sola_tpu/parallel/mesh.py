"""Device mesh + sharding utilities.

The selection model is ~25M params, so the idiomatic TPU scaling strategy is
pure data parallelism: parameters replicated, the (video, expression) batch
axis sharded across chips, collectives (psum of losses/grad means handled by
jit) riding ICI (SURVEY.md §2.3 / §5 mapping). The reference's only
parallelism is N independent processes sharded by video index — here it is
one SPMD program over a Mesh.

Mesh axes:
  data — batch/data parallelism (videos x expressions);
  model — reserved for tensor parallelism of the trackgen backbones (SAM2 /
          GroundingDINO image encoders), unused by the selection model.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a collated batch with its leading axis split across 'data'.

    The batch size must divide the data-axis size; the bucketed Loader pads
    batches to full size before multi-chip dispatch.
    """
    sharding = data_sharding(mesh)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


class _PadEntry(str):
    """Sentinel for list padding in ``pad_batch_to``: a distinct object
    (check with ``is PAD_ENTRY``) that still behaves as an empty string so
    text encoders and logging accept padded expression rows."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return "<PAD_ENTRY>"


PAD_ENTRY = _PadEntry("")


def pad_batch_to(batch: dict, target_b: int) -> dict:
    """Pad the leading axis to ``target_b`` with zeros/False so every shard is
    full; padded rows carry all-False track masks and thus contribute nothing
    to masked losses or metrics.

    List entries (metadata like ``(video_id, expression_id)``) are padded
    with ``PAD_ENTRY`` — a distinct sentinel, NOT a copy of the last sample —
    so a consumer keying a dict by entry can never silently overwrite a real
    row with a padded one; filter with ``e is not PAD_ENTRY``."""
    import numpy as np

    def pad(x):
        if isinstance(x, np.ndarray) and x.ndim >= 1 and x.shape[0] < target_b:
            pad_width = [(0, target_b - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, pad_width)
        if isinstance(x, list) and len(x) < target_b:
            # array rows (e.g. object_token_rows) pad with a zeros row of
            # the same shape — their content is masked out downstream;
            # metadata strings pad with the PAD_ENTRY sentinel
            fill = (np.zeros_like(x[-1])
                    if x and isinstance(x[-1], np.ndarray) else PAD_ENTRY)
            return x + [fill] * (target_b - len(x))
        return x

    out = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            out[k] = {kk: pad(vv) for kk, vv in v.items()}
        else:
            out[k] = pad(v)
    return out
