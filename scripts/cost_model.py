"""Multi-chip scaling cost model — calibrated, falsifiable predictions.

This box has ONE tunneled v5e chip, so multi-chip efficiency cannot be
measured directly. VERDICT r4 #6 asks for the honest substitute: a cost
model whose every parameter is either (a) measured on the real chip,
(b) recorded by the 8-virtual-device dryrun telemetry, or (c) a public
hardware spec carried as an explicit sweep parameter — reconciled
against the measured D=1 anchor, with predictions a future multi-chip
run can falsify.

Calibration facts (sources in comments):

  MEASURED (BENCH_r04/r05, real v5e):
    T_single(64 MiB DNA)    = 0.462 s  (construct_64MiB_MBps = 145.2)
    T_sharded_D1(64 MiB)    = 0.660 s  (sharded_build_64MiB_1dev_device_s)
    -> block-bitonic structural overhead at D=1: 1.43x
  RECORDED (MULTICHIP dryrun telemetry, 8 virtual devices):
    per-round ppermute payload at D=8, L=131072: 31,457,280 B/device
    -> 240 B/element/round == 2 bitonic sorts x S(8)=6 merge-split
       stages x (5 operands x 4 B) == the closed-form
       V(L, D) = 2 * S(D) * 20 * L,  S(D) = log2(D)(log2(D)+1)/2
       (halo + rerank collectives are <2% and folded into slack).
  SPEC SWEEP:
    v5e ICI: 1,600 Gbps aggregate per chip (public spec). How much is
    usable one-way on the mesh axis depends on topology (2D torus,
    link count along the axis); the sweep spans 25-200 GB/s.

Run: python scripts/cost_model.py   (pure arithmetic, no devices)
The ARCHITECTURE.md "multi-chip scaling model" section quotes this
script's output verbatim.
"""

from __future__ import annotations

import math

# --- measured / recorded parameters ---------------------------------------
T_SINGLE_64 = 0.462          # s, real-chip single engine, 64 MiB DNA
T_D1_64 = 0.660              # s, sharded engine on a 1-device mesh
N64 = 64 * 2**20             # elements (bytes)
ROUNDS_64_DNA = 1            # sharded rounds at 64 MiB DNA: the 40-char
                             # coded initial sort finishes in ONE round
                             # (measured via round_hook on the 8-device
                             # CPU mesh; the enwik8-class text corpus
                             # takes 5 — both arms of the ratio scale
                             # with round count, so per-round efficiency
                             # carries over to multi-round classes)
BYTES_PER_EL_STAGE = 20      # 5 sort operands x 4 B (dryrun-validated)


def S(d: int) -> int:
    """Merge-split stages of one block-bitonic sort over d runs."""
    k = int(math.log2(d))
    return k * (k + 1) // 2


def bitonic_bytes_per_el(d: int) -> float:
    """ICI bytes per element per doubling round, bitonic engine
    (2 sorts: rank-key + route-home)."""
    return 2 * S(d) * BYTES_PER_EL_STAGE


def samplesort_bytes_per_el(d: int) -> float:
    """Sample-sort alternative: every element crosses ICI ~once per
    sort (all-to-all), plus splitter all_gathers (negligible)."""
    return 2 * (1 - 1 / d) * BYTES_PER_EL_STAGE


def predict(d: int, bw_gbps: float, engine="bitonic"):
    """(efficiency, t_build_s) for the 64 MiB config on d chips.

    Compute side: the D=1 sharded anchor scaled linearly in L = n/d
    (sorts are O(L log L); assuming linearity flatters the compute arm
    slightly, which makes the efficiency prediction CONSERVATIVE —
    stated as such in ARCHITECTURE.md).
    """
    t_comp = T_D1_64 / d
    per_el = (bitonic_bytes_per_el(d) if engine == "bitonic"
              else samplesort_bytes_per_el(d))
    t_comm = ROUNDS_64_DNA * (N64 / d) * per_el / (bw_gbps * 1e9)
    t_total = t_comp + t_comm
    eff = T_SINGLE_64 / (d * t_total)
    return eff, t_total


def main():
    print("Multi-chip scaling prediction, 64 MiB DNA build "
          "(all numbers from the calibration facts above)\n")
    print(f"D=1 anchor: sharded/single = {T_D1_64 / T_SINGLE_64:.2f}x "
          "(measured, real chip)\n")
    hdr = f"{'engine':<11} {'BW GB/s':>8} " + "".join(
        f"{'D=' + str(d):>12}" for d in (2, 4, 8, 16))
    print(hdr)
    for engine in ("bitonic", "samplesort"):
        for bw in (25, 45, 90, 200):
            cells = []
            for d in (2, 4, 8, 16):
                eff, t = predict(d, bw, engine)
                cells.append(f"{eff * 100:5.0f}% {t * 1e3:4.0f}ms")
            print(f"{engine:<11} {bw:>8} " + " ".join(f"{c:>12}" for c in cells))
        print()
    print("Readings:")
    print(f"  1. The D=1 structural overhead alone caps efficiency at "
          f"1/{T_D1_64 / T_SINGLE_64:.2f} = "
          f"{T_SINGLE_64 / T_D1_64 * 100:.0f}% at ANY bandwidth — the "
          "'>=70% at >=2 hosts' north star is NOT met by this engine "
          "as-is; closing it needs the block-sort overhead down "
          "(~1.2x => 83% ceiling), not more ICI.")
    print("  2. Bitonic comm grows with log^2(D) (2*S(D)*20 B/el/round);"
          " sample-sort moves each element ~once per sort. They tie at "
          "D=2; from D=4 the distributed merge must switch to "
          "sample-sort to stay within ~5% of the structural ceiling.")
    print("  3. Falsifiable: a D-chip run measures t_build; the "
          "t_total column is the prediction (pick the row matching the "
          "mesh axis' real one-way ICI bandwidth).")


if __name__ == "__main__":
    main()
