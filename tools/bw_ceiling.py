"""Memory-bandwidth pairwise-scaling ceiling probe for this box.

The crawl's per-URL work after the round-5 canonicalization cut is
dominated by memory traffic (8 KiB html payloads: cache writes, shuffle
buffers, string materialization, GC evacuation copies), not arithmetic.
Scaling efficiency between parallelism levels is therefore bounded not by
the pure-CPU pairwise ceiling (~0.97 at 1->4 on this box) but by how
aggregate memory bandwidth grows with concurrent streams.  This probe
measures that growth for the two traffic archetypes:

- read:  sequential reduction over a 1 GiB array (numpy sum) — the
  fetch join's cache scan shape.
- copy:  read+write over a 512 MiB src/dst pair (numpy copyto) — the
  cache population / shuffle write / GC evacuation shape.

Working sets are sized ABOVE this box's 260 MiB L3 (1 GiB read; 1 GiB
combined copy pair) so even a single process streams from DRAM — an
L3-resident low level would inflate agg_lo and understate the ceiling —
while N processes x the array still fit in RAM at the widest level.

Protocol: per level N, N processes run the kernel simultaneously with a
barrier-ish start (forked together), each reporting its own GB/s over
fixed reps; aggregate = sum of per-proc GB/s; pairwise ceiling for
lo->hi = (agg_hi / agg_lo) / (hi / lo).  Repeated REPS times,
max-of-repeats aggregate per level (best case for the machine, i.e. the
most conservative ceiling claim).

Usage: python tools/bw_ceiling.py [levels ...]   (default: 1 4)
Writes BENCH/BW_CEILING.json and prints one RESULT line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read_kernel(q):
    import numpy as np

    a = np.ones(1024 * 1024 * 1024 // 8)
    a.sum()  # fault + warm
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        a.sum()
    q.put(reps * a.nbytes / (time.perf_counter() - t0) / 1e9)


def _copy_kernel(q):
    import numpy as np

    a = np.ones(512 * 1024 * 1024 // 8)
    b = np.empty_like(a)
    np.copyto(b, a)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(b, a)
    q.put(reps * 2 * a.nbytes / (time.perf_counter() - t0) / 1e9)


def _crawlmix_kernel(q):
    """The crawl's actual per-URL work shape, Spark-free: sha1 digest +
    regex link extraction + canonicalize-ish string ops over an ~8 KiB
    page with ~25 links — the CC-weight corpus's per-URL mix.  Reports
    pages/s (unit differs from the GB/s kernels; only the PAIRWISE ratio
    is consumed)."""
    import hashlib
    import re

    words = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
             "do eiusmod tempor incididunt ut labore et dolore magna ").split()
    body_parts = []
    for i in range(25):
        body_parts.append(
            f'<p>{" ".join(words[(i + j) % len(words)] for j in range(40))}'
            f'</p><a href="HTTP://Host{i}.example.com:80/Path{i}/page.html'
            f'?b=2&a=1#frag">x</a>'
        )
    body = ("<html>" + "".join(body_parts) + "</html>").ljust(8192, "x")
    href = re.compile(r'href="([^"]+)"')
    n = 4000
    # warm
    hashlib.sha1(body.encode()).hexdigest()
    t0 = time.perf_counter()
    for _ in range(n):
        hashlib.sha1(body.encode()).hexdigest()
        links = href.findall(body)
        for l in links:
            u = l.lower()
            host, _, rest = u.partition("://")[2].partition("/")
            _ = host.removesuffix(":80") + "/" + rest.partition("#")[0]
    q.put(n / (time.perf_counter() - t0))


KERNELS = {"read": _read_kernel, "copy": _copy_kernel,
           "crawlmix": _crawlmix_kernel}


def aggregate(kernel, n_procs: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=kernel, args=(q,)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main():
    levels = [int(x) for x in sys.argv[1:]] or [1, 4]
    repeats = int(os.environ.get("BW_REPEATS", "3"))
    out = {"levels": levels, "repeats": repeats, "kernels": {}}
    for name, kern in KERNELS.items():
        agg = {
            lv: max(aggregate(kern, lv) for _ in range(repeats))
            for lv in levels
        }
        pairs = {
            f"{lo}to{hi}": round((agg[hi] / agg[lo]) / (hi / lo), 3)
            for lo in levels
            for hi in levels
            if hi > lo
        }
        out["kernels"][name] = {
            "aggregate_gbps": {str(k): round(v, 2) for k, v in agg.items()},
            "pairwise_ceiling": pairs,
        }
        print(name, out["kernels"][name], flush=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BW_CEILING.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
