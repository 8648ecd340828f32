"""Expert parallelism: MoE experts sharded over a mesh axis.

Greenfield TPU-native component (no reference counterpart — SURVEY.md §2
"Parallelism ... absent"). The stacked [E, ...] expert tensors of
models/moe.MoEFeedForward are sharded on E over an ``expert`` mesh axis and
the layer runs under shard_map:

  * routing (softmax + top-k + capacity assignment) is computed identically
    on every device from the replicated activations — it is O(T*E), trivia
    next to the expert FFN flops, and replicating it avoids a gather;
  * each device slices ITS experts' columns out of the dispatch/combine
    tensors (a static local slice by axis index), builds only the local
    [E/p, C, d] expert batch, and runs the (optionally int8) expert FFN;
  * the combine einsum produces a partial [T, d] sum over local experts;
    one ``psum`` over the expert axis completes it — the collective rides
    ICI and is the layer's only cross-device traffic.

This is the dense-dispatch formulation of expert parallelism: the psum plays
the role of the combine all-to-all, with per-device compute identical to the
classic a2a formulation but no host-side permutation bookkeeping.

REGIME BOUND (know before scaling): the dispatch/combine tensors are
[T, E, C] and REPLICATED on every device, so per-device routing memory and
the dispatch einsum flops grow as O(T * E * C) ~ O(T^2 * capacity_factor *
top_k) — independent of the device count. That is fine for the serving
regime this repo targets (T = batch x decode-step tokens, thousands;
E <= 64) and for CI-scale tests; for large-T training at high expert
counts use ``ep_moe_forward_a2a`` — the classic all-to-all formulation
(local routing on T/p tokens, dispatch a2a -> local FFN -> combine a2a):
per-device routing state O(T/p * E * C_loc) and traffic O(T/p * d) x2
with no psum, vs this variant's replicated routing and O(T * d) psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qgemm_tpu.models.moe import (
    MoEFeedForward,
    QuantizedExpertWeight,
    _capacity,
    expert_ffn,
    quantized_expert_ffn,
    route,
)
from qgemm_tpu.parallel.tp_ops import shard_map


def ep_moe_forward(x, moe: MoEFeedForward, mesh: Mesh, axis: str = "expert"):
    """Run an MoEFeedForward with its expert dim sharded over ``axis``.

    x [..., d] replicated -> [..., d] replicated. Works for float and
    quantized expert weights; n_experts must divide the axis size evenly.
    """
    n_dev = mesh.shape[axis]
    e = moe.n_experts
    assert e % n_dev == 0, f"{e} experts not divisible by {n_dev} devices"
    e_loc = e // n_dev
    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    t = xf.shape[0]
    cap = _capacity(t, e, moe.top_k, moe.capacity_factor)
    quantized = moe.is_quantized

    def body(xf, router_w, up_q, up_c, down_q, down_c):
        dispatch, combine = route(xf, router_w, moe.top_k, cap)
        lo = jax.lax.axis_index(axis) * e_loc
        d_loc = jax.lax.dynamic_slice_in_dim(dispatch, lo, e_loc, axis=1)
        c_loc = jax.lax.dynamic_slice_in_dim(combine, lo, e_loc, axis=1)
        expert_in = jnp.einsum("tec,td->ecd", d_loc,
                               xf.astype(jnp.float32))
        if quantized:
            out_loc = quantized_expert_ffn(
                expert_in, QuantizedExpertWeight(up_q, up_c),
                QuantizedExpertWeight(down_q, down_c))
        else:
            out_loc = expert_ffn(expert_in.astype(up_q.dtype), up_q, down_q)
        partial = jnp.einsum("tec,ecd->td", c_loc, out_loc)
        return jax.lax.psum(partial, axis)

    if quantized:
        up_q, up_c = moe.w_up
        down_q, down_c = moe.w_down
    else:  # dense: pass zeros-shaped dummies for the scale slots
        up_q, up_c = moe.w_up, jnp.zeros((e, 1, 1), jnp.float32)
        down_q, down_c = moe.w_down, jnp.zeros((e, 1, 1), jnp.float32)

    espec = P(axis, None, None)
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(), espec, espec, espec, espec),
                  out_specs=P(), check_rep=False)
    out = f(xf, moe.router_w, up_q, up_c, down_q, down_c)
    return out.reshape(shape).astype(x.dtype)


def ep_moe_forward_a2a(x, moe: MoEFeedForward, mesh: Mesh,
                       axis: str = "expert"):
    """The all-to-all formulation of expert parallelism — the scaling
    regime the dense-dispatch variant's docstring bounds out:

      * TOKENS are sharded over the expert axis (each device routes only
        its T/p tokens — routing state is O(T/p * E * C_loc), never
        replicated);
      * dispatch locally into [E, C_loc, d] per-expert buffers, then ONE
        tiled ``all_to_all`` (split E, concat capacity) lands
        [E/p, p*C_loc, d] on each device — exactly its experts' slots from
        every source;
      * local (optionally int8) expert FFN on the owned experts;
      * the REVERSE all_to_all returns each token's expert outputs home
        and the prob-weighted combine is local — per-device traffic is
        O(T/p * d) x2 with NO psum, vs the dense-dispatch psum's O(T * d).

    x [T, d(, ...)] with T divisible by the axis size; expert weights
    sharded on E (shard_moe). Token-drop semantics differ from the
    single-device layer when capacity binds: capacity is enforced per
    source device (C_loc from T/p tokens), the standard EP behavior.
    """
    n_dev = mesh.shape[axis]
    e = moe.n_experts
    assert e % n_dev == 0, f"{e} experts not divisible by {n_dev} devices"
    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    t = xf.shape[0]
    assert t % n_dev == 0, f"{t} tokens not divisible by {n_dev} devices"
    cap = _capacity(t // n_dev, e, moe.top_k, moe.capacity_factor)
    quantized = moe.is_quantized

    def body(xf, router_w, up_q, up_c, down_q, down_c):
        dispatch, combine = route(xf, router_w, moe.top_k, cap)
        expert_in = jnp.einsum("tec,td->ecd", dispatch,
                               xf.astype(jnp.float32))     # [E, C_loc, d]
        # split E into p chunks (chunk j -> device j), concat received
        # chunks along capacity: [E/p, p*C_loc, d] = my experts' slots
        # from every source device
        gathered = jax.lax.all_to_all(expert_in, axis, split_axis=0,
                                      concat_axis=1, tiled=True)
        if quantized:
            out_loc = quantized_expert_ffn(
                gathered, QuantizedExpertWeight(up_q, up_c),
                QuantizedExpertWeight(down_q, down_c))
        else:
            out_loc = expert_ffn(gathered.astype(up_q.dtype), up_q, down_q)
        # reverse exchange: split capacity back per source, concat experts
        returned = jax.lax.all_to_all(out_loc.astype(jnp.float32), axis,
                                      split_axis=1, concat_axis=0,
                                      tiled=True)          # [E, C_loc, d]
        return jnp.einsum("tec,ecd->td", combine, returned)

    if quantized:
        up_q, up_c = moe.w_up
        down_q, down_c = moe.w_down
    else:
        up_q, up_c = moe.w_up, jnp.zeros((e, 1, 1), jnp.float32)
        down_q, down_c = moe.w_down, jnp.zeros((e, 1, 1), jnp.float32)

    espec = P(axis, None, None)
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(axis, None), P(), espec, espec, espec, espec),
                  out_specs=P(axis, None), check_rep=False)
    out = f(xf, moe.router_w, up_q, up_c, down_q, down_c)
    return out.reshape(shape).astype(x.dtype)


def shard_moe(moe: MoEFeedForward, mesh: Mesh,
              axis: str = "expert") -> MoEFeedForward:
    """Place the stacked expert tensors with their E dim sharded over
    ``axis`` (GSPMD path: XLA partitions the dispatch/FFN/combine einsums
    and inserts the collectives itself)."""
    from jax.sharding import NamedSharding

    def put(w, spec):
        return jax.device_put(w, NamedSharding(mesh, spec))

    espec = P(axis, None, None)
    shard_w = (lambda w: type(w)(*(put(l, espec) for l in w))
               if isinstance(w, QuantizedExpertWeight) else put(w, espec))
    return MoEFeedForward(
        router_w=put(moe.router_w, P()),
        w_up=shard_w(moe.w_up), w_down=shard_w(moe.w_down),
        n_experts=moe.n_experts, top_k=moe.top_k,
        capacity_factor=moe.capacity_factor)
