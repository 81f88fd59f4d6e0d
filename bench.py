"""Driver benchmark entry point: prints ONE JSON line.

Implementation lives in allegro_tpu.bench (usable from the CLI as the
`benchmark` stage too).
"""

import json
import os
import sys

# persistent compilation cache: repeated driver runs skip the (minutes-long)
# remote XLA compile
try:
    import jax

    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from allegro_tpu.bench import run_benchmark

if __name__ == "__main__":
    n = int(os.environ.get("BENCH_N_ATOMS", "4096"))
    result = run_benchmark(n_atoms=n, verbose="-v" in sys.argv)
    print(json.dumps(result))
