import jax, numpy as np, time, functools
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_sparse.sparse.convert import to_csr
from tpu_sparse.sparse.cwell import csr_to_cwell, LW
from tpu_sparse.sparse import generators

def make_kernel(variant, RB, S, unroll=1):
    def kern(srow_ref, x2d_ref, vals_ref, idx2_ref, y_ref, xw):
        lax_ = jax.lax
        i32 = lambda v: jnp.array(v, jnp.int32)
        G = S // 8
        def g_body(g, carry):
            rb, acc = carry
            base = lax_.mul(g, i32(8))
            if variant != "noread":
                for s in range(8):
                    r = srow_ref[0, rb, lax_.add(base, i32(s))]
                    xw[s, :] = x2d_ref[r, :]
                    xw[8 + s, :] = x2d_ref[lax_.add(r, i32(1)), :]
            idx = idx2_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
            if variant == "nogather":
                gathered = xw[0:8, :]
            else:
                lo = jnp.take_along_axis(xw[0:8, :], jnp.minimum(idx, 127), axis=1)
                hi = jnp.take_along_axis(xw[8:16, :], jnp.clip(idx - 128, 0, 127), axis=1)
                gathered = jnp.where(idx < 128, lo, hi)
            acc = acc + vals_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :] * gathered
            return rb, acc
        def rb_body(rb, _):
            acc = jnp.zeros((8, LW), jnp.float32)
            _, acc = lax_.fori_loop(0, G, g_body, (rb, acc), unroll=unroll)
            y_ref[rb, :] = jnp.sum(acc, axis=0)
            return 0
        lax_.fori_loop(0, RB, rb_body, 0)
    return kern

@functools.partial(jax.jit, static_argnames=("variant","shape","rb","unroll"))
def run_variant(vals, idx2, srow, x, *, variant, shape, rb, unroll):
    nb, S, _ = vals.shape
    n, m = shape
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    x2d = jnp.pad(x, (0, m_pad - m)).reshape(-1, LW)
    grid = (nb + rb - 1) // rb
    nb_pad = grid * rb
    if nb_pad != nb:
        vals = jnp.pad(vals, ((0, nb_pad - nb), (0, 0), (0, 0)))
        idx2 = jnp.pad(idx2, ((0, nb_pad - nb), (0, 0), (0, 0)))
        srow = jnp.pad(srow, ((0, nb_pad - nb), (0, 0)))
    srow3 = srow.reshape(grid, rb, S)
    y = pl.pallas_call(
        make_kernel(variant, rb, S, unroll),
        out_shape=jax.ShapeDtypeStruct((nb_pad, LW), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, rb, S), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, LW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024),
    )(srow3, x2d, vals, idx2)
    return y.reshape(-1)[:n]

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
with jax.default_device(cpu):
    A = to_csr(generators.poisson3d_27pt(64, dtype=np.float32))
    W = csr_to_cwell(A)
n = A.shape[0]
W = jax.device_put(W, tpu)
x = jax.device_put(jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32)), tpu)
K = 32
import sys
_v, _u = sys.argv[1], int(sys.argv[2])
for variant, unroll in [(_v, _u)]:
    g = jax.jit(lambda v, _var=variant, _u=unroll: jnp.sum(
        lax.fori_loop(0, K, lambda i, y: run_variant(W.vals, W.idx2, W.srow, y, variant=_var, shape=W.shape, rb=48, unroll=_u)*np.float32(1/27), v)))
    t0=time.time(); float(g(x)); print(f"{variant} u{unroll}: compile+first {round(time.time()-t0,1)}s", flush=True)
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); float(g(x)); ts.append(time.perf_counter()-t0)
    per = (min(ts))/K
    print(f"  {variant} u{unroll}: ~{per*1e6:.0f} us/iter -> {W.nnz/per/1e9:.1f} Gnnz/s", flush=True)
print("DONE", flush=True)
