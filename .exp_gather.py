import jax, numpy as np, time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_wide(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

rng = np.random.default_rng(0)
src = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 256, (8, 128)).astype(np.int32))
try:
    y = pl.pallas_call(
        k_wide,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    y = np.asarray(y)
    expect = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    print("wide gather OK, max err", np.abs(y - expect).max(), flush=True)
except Exception as e:
    print("wide gather FAILED:", str(e)[:300], flush=True)
