#!/usr/bin/env python3
"""Single-threaded pure-CPU contention probe for scaling-bench windows.

Runs a fixed ALU-bound work unit in a loop and appends each iteration's
wall time (seconds, one float per line) to the output file. A window
qualifies for the scaling table only if the probe's median iteration time
during the window stays within 10% of a solo calibration run — hypervisor
descheduling shows up directly as probe slowdown.

usage: cpu_probe.py <iterations|0=until-killed> <outfile>
"""
import sys
import time


def work_unit():
    # ~0.25 s of pure integer ALU work on this box; no allocation churn
    acc = 0
    for i in range(2_500_000):
        acc += i * i ^ (i << 1)
    return acc


def main():
    iters = int(sys.argv[1])
    out = open(sys.argv[2], "a", buffering=1)
    n = 0
    while iters == 0 or n < iters:
        t0 = time.perf_counter()
        work_unit()
        out.write(f"{time.perf_counter() - t0:.6f}\n")
        n += 1
        time.sleep(0.25)  # half duty cycle: measure, don't load the box


if __name__ == "__main__":
    main()
