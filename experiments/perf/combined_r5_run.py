"""One-claim combined round-5 perf run: loader worker-scaling sweep, then the
perf-switch A/B matrix — a single process so the axon device claim (which can
queue ~25 min behind pool contention) is paid once.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments/perf")

import ab_matrix
import loader_scaling

if __name__ == "__main__":
    loader_scaling.main()
    ab_matrix.main()
