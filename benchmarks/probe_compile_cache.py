"""Persistent-compilation-cache experiment (VERDICT r4 missing #2).

The reference shows its first frame in ~1 s (no compile step,
pathfinder_viewer.py:226); this build pays 15-300 s of XLA/Mosaic
compile per fresh process. JAX's persistent compilation cache
(jax_compilation_cache_dir) serializes compiled executables keyed by
HLO; a second process should load instead of compile — IF the axon
relay's remote-compile path is intercepted client-side.

Protocol: run this script twice in fresh processes. Run 1 populates the
cache (cold compile); run 2 measures the warm-start compile+first time.
Reports the compile+first and steady times for a small dense-Farneback
scan (the headline path, exercising both XLA and the Mosaic warp
kernel). Diagnostics to stderr; pass --cpu to rehearse off-relay.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from hackathonopticalflow_tpu.core.config import FarnebackParams
    from hackathonopticalflow_tpu.flow.dense import farneback_flow_video
    from bench import load_frames

    t_start = time.perf_counter()
    log(f"device: {jax.devices()[0]} (init {time.perf_counter() - t_start:.1f}s)")
    n_pairs = 4
    frames = load_frames(n_pairs, 720, 1280)
    dev = jax.device_put(jnp.asarray(frames, jnp.float32))
    params = FarnebackParams()

    @jax.jit
    def run(fr):
        return jnp.sum(jnp.abs(farneback_flow_video(fr, params)))

    t0 = time.perf_counter()
    _ = float(run(dev))
    log(f"compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    _ = float(run(dev))
    log(f"steady scan: {time.perf_counter() - t0:.2f}s")
    log(f"total wall from import: {time.perf_counter() - t_start:.1f}s")


if __name__ == "__main__":
    main()
