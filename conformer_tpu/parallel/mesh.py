"""Device mesh construction and sharding rules (GSPMD / pjit style).

The reference's only parallelism is single-node DDP over NCCL
(reference: train.py:26-34,186). Here scaling is SPMD over a named
``jax.sharding.Mesh`` with axes ``("data", "model")``:

- batch dims are sharded over ``data`` (data parallelism — XLA inserts the
  gradient psum the reference got implicitly from DDP backward,
  reference: train.py:239);
- the big matmuls (FFN hidden, attention heads, LSTM gates, vocab projection)
  are sharded over ``model`` (tensor parallelism over ICI — a new capability,
  SURVEY §2.10);
- under jit+GSPMD, global reductions (loss means, BatchNorm statistics) are
  computed over the *global* batch automatically — no explicit collectives.

Multi-host: the same code runs under ``jax.distributed.initialize``; the mesh
spans all processes' devices and per-host input shards are assembled with
``make_global_batch``.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conformer_tpu.config import ParallelConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh. dp defaults to n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg: ParallelConfig,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    return make_mesh(cfg.dp or None, cfg.tp, devices)


# ---------------------------------------------------------------------------
# Parameter partitioning rules.
#
# Each rule maps a regex over the flattened parameter path (joined with '/')
# to a PartitionSpec for the *unstacked* parameter. Parameters living under
# the encoder's scanned `blocks` get an extra leading layer axis which is
# never sharded.
# ---------------------------------------------------------------------------

_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # FFN: shard the expansion dim; contraction dim on the second matmul.
    (r".*ffn\d/hidden/kernel$", P(None, MODEL_AXIS)),
    (r".*ffn\d/hidden/bias$", P(MODEL_AXIS)),
    (r".*ffn\d/out/kernel$", P(MODEL_AXIS, None)),
    # Attention: shard heads (output dim of q/k/v/pos, input dim of out-proj).
    (r".*attention/(query|key|value|pos)/kernel$", P(None, MODEL_AXIS)),
    (r".*attention/(query|key|value|pos)/bias$", P(MODEL_AXIS)),
    (r".*attention/(content_bias|position_bias)$", P(MODEL_AXIS, None)),
    (r".*attention/out/kernel$", P(MODEL_AXIS, None)),
    # Conv module pointwise convs (Dense): shard the doubled channel dim.
    (r".*conv/pointwise1/kernel$", P(None, MODEL_AXIS)),
    (r".*conv/pointwise1/bias$", P(MODEL_AXIS)),
    (r".*conv/pointwise2/kernel$", P(MODEL_AXIS, None)),
    # Decoder LSTM gates and vocab projection.
    (r".*lstm_\d+/input_proj/kernel$", P(None, MODEL_AXIS)),
    (r".*decoder/classifier/kernel$", P(None, MODEL_AXIS)),
    (r".*decoder/classifier/bias$", P(MODEL_AXIS)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "name", str(p))
        parts.append(str(name))
    return "/".join(parts)


def param_spec(path, leaf, tp_enabled: bool) -> P:
    """PartitionSpec for one parameter leaf."""
    if not tp_enabled:
        return P()
    s = _path_str(path)
    scanned = "/blocks/" in s or s.startswith("blocks/")
    for pattern, spec in _TP_RULES:
        if re.match(pattern, s):
            parts = tuple(spec)
            if scanned:
                parts = (None,) + parts
            # Guard rank mismatches (e.g. future param shape changes).
            if len(parts) > leaf.ndim:
                parts = parts[: leaf.ndim]
            while len(parts) < leaf.ndim:
                parts = parts + (None,)
            return P(*parts)
    return P()


def make_param_shardings(mesh: Mesh, params: Any, tp_enabled: bool = True) -> Any:
    """Pytree of NamedShardings matching `params`."""
    def one(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf, tp_enabled))
    return jax.tree_util.tree_map_with_path(one, params)


def make_opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any,
                             tp_enabled: bool = True,
                             zero: bool = False) -> Any:
    """Shardings for an optax state: leaves whose shape matches a parameter
    (Adam moments) get that parameter's sharding; scalars/counters replicate.

    Works structurally: any opt-state leaf that is itself a pytree congruent
    with `params` is mapped leaf-by-leaf.

    ``zero=True`` additionally shards each moment leaf over the DATA axis
    (ZeRO-1 / optimizer-state sharding — no reference counterpart): the
    first dimension not already TP-sharded and divisible by dp carries the
    'data' axis, cutting resident optimizer memory per chip by dp with
    identical numerics (GSPMD reshards around the Adam update). Leaves with
    no divisible dimension stay on the param sharding.
    """
    param_sh = make_param_shardings(mesh, params, tp_enabled)
    if zero:
        dp = mesh.shape.get(DATA_AXIS, 1)
        if dp > 1:
            def zero_one(leaf, sh):
                parts = list(tuple(sh.spec))
                parts += [None] * (getattr(leaf, "ndim", 0) - len(parts))
                for i, (p, dim) in enumerate(zip(parts, leaf.shape)):
                    if p is None and dim >= dp and dim % dp == 0:
                        parts[i] = DATA_AXIS
                        break
                return NamedSharding(mesh, P(*parts))
            param_sh = jax.tree_util.tree_map(zero_one, params, param_sh)
    params_struct = jax.tree_util.tree_structure(params)

    def map_node(node):
        try:
            if jax.tree_util.tree_structure(node) == params_struct:
                return param_sh
        except Exception:
            pass
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), node)

    # optax states are tuples/namedtuples of nodes; map one level down.
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "shape"):
        mapped = []
        for node in opt_state:
            if isinstance(node, tuple) and not hasattr(node, "shape"):
                inner = type(node)(*[map_node(x) for x in node]) \
                    if hasattr(node, "_fields") else tuple(map_node(x) for x in node)
                mapped.append(inner)
            else:
                mapped.append(map_node(node))
        return type(opt_state)(*mapped) if hasattr(opt_state, "_fields") \
            else tuple(mapped)
    return map_node(opt_state)


def seq_shard_constraint(x):
    """Sequence parallelism: pin (B, L, D) activations to
    P('data', 'model', None) so the pointwise work between matmuls
    (norms, FFN elementwise, dropout, residuals) runs time-sharded over
    the tensor-parallel axis — the Megatron-SP layout, with GSPMD
    inserting the all-gathers attention and conv need. Uneven L is fine
    (the partitioner pads internally).

    No-op unless traced under an active ('data','model') mesh context
    (``jax.set_mesh``) with Auto axes and tp > 1, so the model stays
    runnable on one chip and under pure DP unchanged.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or getattr(mesh, "empty", True):
        return x
    shape = dict(getattr(mesh, "shape", {}))
    if shape.get(MODEL_AXIS, 1) <= 1 or getattr(x, "ndim", 0) != 3:
        return x
    try:
        if any(t != jax.sharding.AxisType.Auto for t in mesh.axis_types):
            return x  # explicit-sharding meshes use reshard semantics
    except Exception:
        return x
    batch_axis = DATA_AXIS if DATA_AXIS in shape else None
    return jax.lax.with_sharding_constraint(x, P(batch_axis, MODEL_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim data sharding for batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch_tree(mesh: Mesh, tree: Any) -> Any:
    """NamedShardings with P('data') on dim 0 for every array leaf."""
    def one(leaf):
        spec = P(DATA_AXIS) if getattr(leaf, "ndim", 0) >= 1 else P()
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(one, tree)


def make_global_batch(mesh: Mesh, tree: Any) -> Any:
    """Assemble per-process host arrays into global sharded jax.Arrays.

    Single-process: a device_put with the data sharding. Multi-host: each
    process contributes its local stripe (host arrays must already be the
    per-process shard, as produced by the sharded input pipeline).
    """
    shardings = shard_batch_tree(mesh, tree)
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, jax.tree_util.tree_map(lambda s: s.spec, shardings))
