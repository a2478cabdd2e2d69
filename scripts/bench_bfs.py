"""Secondary benchmarks from BASELINE.md: time-to-env.txt on the wiki example
and BFS node-expansions/s.

The reference's raw wgs reads are not shipped, so (as in tests/test_env_golden
.py) the k-mer map is the golden graph.txt-restricted map; the timed quantity
is everything downstream of counting: seed -> BFS -> extend -> graph.txt
write. That is exactly the reference's per-gene calculator stage
(src/algo/OneSequenceCalculator.java:98-114 + printEnvironment).

Usage: python scripts/bench_bfs.py [--device]
  default: host engine (algo/environment.py), the default CLI route
  --device: whole-BFS-in-one-dispatch device engine (ops/bfs_device.py)

Prints one JSON line per metric to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import metacherchant_tpu  # noqa: F401
from metacherchant_tpu.kmer_map import KmerMap
from metacherchant_tpu.counting import seed_keys_of_sequence
from metacherchant_tpu.algo.environment import build_environment
from metacherchant_tpu.io.writers import load_graph_txt, write_graph_txt
from metacherchant_tpu.io.readers import read_rich_fasta

GOLD = "/root/reference/Hi-C_pipline/example_work_dir/output/1/merged"
GENE = "/root/reference/Hi-C_pipline/example/seq.fasta"
K = 31


def main() -> None:
    device = "--device" in sys.argv
    golden_env = load_graph_txt(os.path.join(GOLD, "graph.txt"))
    keys = np.concatenate(
        [seed_keys_of_sequence(s, K, None) for s in golden_env])
    counts = np.array(list(golden_env.values()), np.int64)
    kmap = KmerMap.from_pairs(keys, counts)
    gene = read_rich_fasta(GENE)[0].seq
    print(f"map: {len(golden_env)} kmers", file=sys.stderr)

    if device:
        os.environ["MC_DEVICE_BFS"] = "1"

    def run():
        t0 = time.perf_counter()
        env = build_environment([gene], K, kmap, min_occ=5,
                                both_directions=False, max_radius=100000,
                                max_kmers=None, trim=False)
        sub = env.as_dict()
        write_graph_txt("/tmp/bench_bfs_graph.txt", sub)
        return time.perf_counter() - t0, len(sub)

    run()  # warm (compiles on the device route)
    times = []
    for _ in range(3):
        dt, n = run()
        times.append(dt)
        print(f"env: {n} kmers in {dt:.3f}s", file=sys.stderr)
    best = min(times)
    # every admitted k-mer is one node expansion (8 neighbor probes);
    # the BFS also probes rejected frontier candidates, so this undercounts
    # true probe throughput -- it is the conservative, comparable number
    expansions = n
    print(json.dumps({
        "metric": "time_to_env_txt_wiki_example",
        "value": round(best, 3), "unit": "s",
        "engine": "device" if device else "host"}))
    print(json.dumps({
        "metric": "bfs_node_expansions_per_s",
        "value": round(expansions / best, 1), "unit": "expansions/s",
        "engine": "device" if device else "host"}))


if __name__ == "__main__":
    main()
