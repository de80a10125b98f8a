"""Microbenchmark: capacity-padded expert matmul vs ragged alternatives.

The MoE expert FFN at DeepSpeed capacity semantics computes E*C rows where
E*C = capacity_factor * k * S (= 1.5x the token count at the recipe's
1.5/top-2) — a third of the MXU work is zero padding.  This compares, at the
flagship student MoE shapes (Qwen1.5-1.8B upcycled, T=2048):

  padded  : [E, C, D] @ [E, D, F] batched dense (current moe_ffn/gather path)
  ragged  : jax.lax.ragged_dot on the <= S*k actually-kept rows

Timing rule for the tunneled backend (BENCH_NOTES.md): only a fetch forces
execution, and each fetch costs a ~100+ ms round trip — so N iterations are
CHAINED inside one jit (output feeds the next input's first row) and ONE
scalar is fetched; device time = total / N.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

E, CAPF, K = 4, 1.5, 2
S = 2048          # B=1, T=2048
D, F = 2048, 5504  # qwen1.5-1.8b hidden / ffn
C = int(S * CAPF * K // E)      # 1536
M = S * K                        # 4096 ragged rows (static upper bound)
ITERS = 50

key = jax.random.PRNGKey(0)
kx, kw, kg = jax.random.split(key, 3)
x_pad = jax.random.normal(kx, (E, C, D), jnp.bfloat16)
x_rag = jax.random.normal(kx, (M, D), jnp.bfloat16)
w = jax.random.normal(kw, (E, D, F), jnp.bfloat16) * 0.02
# realistic imbalanced group sizes summing to ~0.92*M, capped at C
gs = np.array([1536, 1100, 900, 300], np.int32)
assert gs.sum() <= M and (gs <= C).all()
group_sizes = jnp.asarray(gs)


def chain(fn):
    """Run fn ITERS times with a data dependency threaded through x."""
    @jax.jit
    def run(x, *rest):
        def body(xc, _):
            y = fn(xc, *rest)
            # fold a scalar of the output back into x: true dependency,
            # negligible cost
            xc = xc + (jnp.max(y[:1]) * 1e-12).astype(xc.dtype)
            return xc, ()
        xc, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(xc[:1].astype(jnp.float32))
    return run


def timeit(fn, *args):
    run = chain(fn)
    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def padded(xp, ws):
    return jnp.einsum("ecd,edf->ecf", xp, ws,
                      preferred_element_type=jnp.bfloat16)


def ragged(xr, ws, g):
    return jax.lax.ragged_dot(xr, ws, g,
                              preferred_element_type=jnp.bfloat16)


from jax.experimental.pallas.ops.tpu import megablox


def gmm(xr, ws, g):
    return megablox.gmm(xr, ws, g, preferred_element_type=jnp.bfloat16)


def gmm_t512(xr, ws, g):
    return megablox.gmm(xr, ws, g, preferred_element_type=jnp.bfloat16,
                        tiling=(512, 512, 512))


def gmm_t256(xr, ws, g):
    return megablox.gmm(xr, ws, g, preferred_element_type=jnp.bfloat16,
                        tiling=(256, 512, 512))


def flops(rows):
    return 2 * rows * D * F


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    print(f"shapes: E={E} C={C} D={D} F={F} M={M} groups={gs.tolist()}",
          flush=True)
    results = {}
    for name, fn, args, rows in [
        ("padded", padded, (x_pad, w), E * C),
        ("ragged_dot", ragged, (x_rag, w, group_sizes), int(gs.sum())),
        ("gmm", gmm, (x_rag, w, group_sizes), int(gs.sum())),
        ("gmm_t512", gmm_t512, (x_rag, w, group_sizes), int(gs.sum())),
        ("gmm_t256", gmm_t256, (x_rag, w, group_sizes), int(gs.sum())),
    ]:
        try:
            print(f"{name:12s} compiling...", flush=True)
            dt = timeit(fn, *args)
            tf = flops(rows) / dt / 1e12
            print(f"{name:12s} {dt*1e3:8.3f} ms   {tf:7.1f} TF/s useful "
                  f"({flops(E*C)/dt/1e12:7.1f} TF/s padded-equiv)",
                  flush=True)
            results[name] = dt
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
    if "padded" in results:
        for k2, v in results.items():
            if k2 != "padded":
                print(f"{k2}: {results['padded']/v:.2f}x vs padded",
                      flush=True)
