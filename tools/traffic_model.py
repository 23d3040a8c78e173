"""Analytic HBM-traffic model of the bitplane witness pipeline.

    python tools/traffic_model.py [--batch 32768] [--len 1024]

Prints, per stage and per configuration, the bytes each pass reads and
writes, the pure-bandwidth floor at the device's peak HBM rate, and the
implied input-GB/s ceiling — the number an INFINITELY fast VPU would
reach.  This is the structural context for BASELINE's vs_baseline metric:
the 0.8x-roofline target prices a single fused read-input/write-witness
kernel (6 B moved per input byte); a staged pipeline moves every
intermediate through HBM, so its ceiling is peak_BW / (total B/byte).

Stage set mirrors ops/bitplane.py in witness mode with H2R_EMIT=kdecode
and H2R_EN_PACK=1 (the round-3 candidate production config).
"""

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--len", type=int, default=1024, dest="length")
    ap.add_argument("--kp", type=int, default=4, help="class planes")
    ap.add_argument("--sb", type=int, default=5, help="state log bits")
    ap.add_argument("--groups", type=int, default=2, help="byte groups")
    ap.add_argument("--fields", type=int, default=3, help="witness fields")
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    args = ap.parse_args(argv)

    B, L = args.batch, args.length
    MB = B * L / 1e6  # input megabytes (1 B per (string, position))
    plane = B * L / 8 / 1e6  # one bit plane, MB (int32-packed: B/32*4)

    stages = []

    def add(name, r, w):
        stages.append((name, r, w))

    # raw_quads: [B, L] u8 -> [L, B] transpose materialization
    add("raw_quads (XLA transpose)", MB, MB)
    # pack: quads in, KP class planes + enable plane out (H2R_EN_PACK=1)
    add("pack kernel (+en)", MB, (args.kp + 1) * plane)
    # scan: class planes in, sb log planes out
    add("scan kernel", args.kp * plane, args.sb * plane)
    # post: log planes + en in, G byte groups (8 planes each) + fb out
    add(
        "post kernel (tag+FSM+bytes+fb)",
        (args.sb + 1) * plane,
        args.groups * 8 * plane + 0.01,
    )
    # decode kernel: byte groups + chars in, fields + masked chars out
    add(
        "decode kernel",
        args.groups * 8 * plane + MB,
        (args.fields + 1) * MB,
    )
    # states assembly (XLA): states col in, [B, L+1] padded out
    add("states assembly (XLA)", MB, MB * (L + 1) / L)

    total_r = sum(r for _, r, _ in stages)
    total_w = sum(w for _, _, w in stages)
    total = total_r + total_w
    floor_ms = total / args.hbm_gbps
    print(f"{'stage':36s} {'read MB':>9s} {'write MB':>9s}")
    for name, r, w in stages:
        print(f"{name:36s} {r:9.1f} {w:9.1f}")
    print(f"{'TOTAL':36s} {total_r:9.1f} {total_w:9.1f}")
    print()
    print(f"input bytes/batch:        {MB:8.1f} MB")
    print(f"traffic per input byte:   {total / MB:8.2f} B")
    print(f"pure-BW floor @ {args.hbm_gbps:.0f} GB/s: {floor_ms:8.3f} ms")
    print(f"input-GB/s ceiling:       {MB / floor_ms:8.1f} GB/s")
    target = 0.8 * args.hbm_gbps / 6.0
    print(
        f"BASELINE target (0.8*BW/6B): {target:6.1f} GB/s "
        f"-> staged-pipeline vs_baseline ceiling = "
        f"{MB / floor_ms / target:0.2f}"
    )
    print(
        "\n(The ceiling prices HBM only; the serial scan's VPU compute "
        "(~240 vops/byte) adds a non-overlapped ~0.26 ms at B=32k.)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
