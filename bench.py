"""Driver benchmark entry point: prints ONE JSON line.

Implementation lives in allegro_tpu.bench (usable from the CLI as the
`benchmark` stage too).
"""

import json
import os
import sys

from allegro_tpu.bench import run_benchmark

if __name__ == "__main__":
    n = int(os.environ.get("BENCH_N_ATOMS", "4096"))
    result = run_benchmark(n_atoms=n, verbose="-v" in sys.argv)
    print(json.dumps(result))
