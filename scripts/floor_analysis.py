"""Derive the realizable speed-of-light for the training step, reproducibly.

docs/PERF.md claims the exact-parity step's floor is ~105-115 ms at batch
128 on a v5e — far above the naive all-FLOPs/peak-MXU figure — because
(a) the step is ~68% HBM-bound and (b) conv throughput is lane-limited at
small channel counts. This script makes that claim a computation instead
of prose: it enumerates every op of the model (convs fwd + data-grad +
filter-grad, convT, pool, BN/elementwise traffic, heads, augment, loss,
optimizer), assigns each
    floor = max(minimal bytes / HBM peak, FLOPs / demonstrated rate)
where "demonstrated rate" is the best per-channel-tier conv rate actually
MEASURED on this chip by scripts/profile_ops.py (not a theoretical MXU
number), and writes the per-layer table + totals to
``docs/floor_analysis.json``.

Pure host-side arithmetic — no TPU needed. Assumptions are explicit
constants below; adjust and re-run to test sensitivity.

Usage: python scripts/floor_analysis.py [--batch 128] [--height 240]
       [--width 320] [--base 32]
"""

from __future__ import annotations

import json
import sys

# Hardware constants (TPU v5e).
HBM_GIBPS = 764.0  # ~820 GB/s marketing = ~764 GiB/s
BF16 = 2

# Demonstrated conv rates by OUTPUT-channel tier, TFLOP/s — the best rates
# profile_ops.py measured on this chip for each shape class (docs/PERF.md):
# forward-style convs (spatial-packed outputs) and filter-gradients
# (output tile is the tiny kernel, lanes limited to cout/128).
FWD_RATE = {32: 103.0, 64: 152.0, 128: 188.0, 256: 190.0, 512: 190.0}
FGRAD_RATE = {32: 48.0, 64: 96.0, 128: 190.0, 256: 190.0, 512: 190.0}


def _rate(table: dict, cout: int) -> float:
    key = min((k for k in table if k >= cout), default=max(table))
    return table[key] * 1e12


def conv_floor(
    name: str, h: int, w: int, cin: int, cout: int, batch: int,
    kernel: int = 3, needs_dx: bool = True,
) -> list[dict]:
    """Floors for one conv: forward, data-grad, filter-grad."""
    px = h * w * batch
    flops = px * kernel * kernel * cin * cout * 2
    in_b, out_b = px * cin * BF16, px * cout * BF16
    bw = HBM_GIBPS * (1 << 30)

    def entry(stage, fl, byts, rate):
        return {
            "op": f"{name}:{stage}",
            "flop_floor_ms": 1e3 * fl / rate,
            "byte_floor_ms": 1e3 * byts / bw,
            "floor_ms": 1e3 * max(fl / rate, byts / bw),
        }

    out = [entry("fwd", flops, in_b + out_b, _rate(FWD_RATE, cout))]
    if needs_dx:
        # data-grad: conv of dout with flipped kernel; output channels = cin
        out.append(entry("dgrad", flops, out_b + in_b, _rate(FWD_RATE, cin)))
    # filter-grad: streams dout + input, writes a tiny kernel
    out.append(entry("fgrad", flops, out_b + in_b, _rate(FGRAD_RATE, cout)))
    return out


def elementwise_floor(name: str, traversals_bytes: float) -> dict:
    ms = 1e3 * traversals_bytes / (HBM_GIBPS * (1 << 30))
    return {"op": name, "flop_floor_ms": 0.0, "byte_floor_ms": ms, "floor_ms": ms}


def main() -> None:
    argv = sys.argv[1:]

    def arg(flag, default):
        return int(argv[argv.index(flag) + 1]) if flag in argv else default

    batch = arg("--batch", 128)
    h, w = arg("--height", 240), arg("--width", 320)
    base = arg("--base", 32)

    c = [base, base * 2, base * 4, base * 8, base * 16]
    dims = [(h >> i, w >> i) for i in range(5)]
    ops: list[dict] = []

    # Encoder ConvBlocks (conv0: cin->cout, conv1: cout->cout) + BN traffic.
    enc_cin = [6] + c[:-1]
    for i in range(5):
        hh, ww = dims[i]
        name = f"enc{i + 1}" if i < 4 else "bottleneck"
        ops += conv_floor(f"{name}.conv0", hh, ww, enc_cin[i], c[i], batch,
                          needs_dx=(i > 0))
        ops += conv_floor(f"{name}.conv1", hh, ww, c[i], c[i], batch)

    # Decoder: convT up + ConvBlock(conv0: 2c->c, conv1: c->c).
    for i in range(4):  # dec4..dec1 -> levels 3..0
        lvl = 3 - i
        hh, ww = dims[lvl]
        cc = c[lvl]
        # convT k2s2: FLOPs = out_px * 4 * cin * cout * 2 (cin = c[lvl+1])
        px = hh * ww * batch
        fl = px * 4 * c[lvl + 1] * cc * 2
        in_b = (px // 4) * c[lvl + 1] * BF16
        out_b = px * cc * BF16
        bw = HBM_GIBPS * (1 << 30)
        for stage, byts in (("fwd", in_b + out_b), ("dgrad", out_b + in_b),
                            ("fgrad", out_b + in_b)):
            ops.append({
                "op": f"up{lvl + 1}:{stage}",
                "flop_floor_ms": 1e3 * fl / _rate(FWD_RATE, cc),
                "byte_floor_ms": 1e3 * byts / bw,
                "floor_ms": 1e3 * max(fl / _rate(FWD_RATE, cc), byts / bw),
            })
        ops += conv_floor(f"dec{lvl + 1}.conv0", hh, ww, 2 * cc, cc, batch)
        ops += conv_floor(f"dec{lvl + 1}.conv1", hh, ww, cc, cc, batch)
        # concat backward split (two slice copies) — measured structurally
        # unavoidable on this platform (split/hybrid rewrites regressed)
        ops.append(elementwise_floor(
            f"dec{lvl + 1}.concat_bwd", 2 * (px * 2 * cc * BF16)
        ))

    # Pools: fwd read+write, bwd (select-and-scatter) read x + dy, write dx.
    for i in range(4):
        hh, ww = dims[i]
        px = hh * ww * batch * c[i] * BF16
        ops.append(elementwise_floor(f"pool{i + 1}.fwd", px + px // 4))
        ops.append(elementwise_floor(f"pool{i + 1}.bwd", px + px // 4 + px))

    # BN: stats reduce fuses into conv epilogue (free-ish); normalize+relu
    # fuses into the next conv's read. Backward needs one extra traversal
    # per BN for the two reductions of (dy, z) before dz can form.
    for i in range(5):
        hh, ww = dims[i]
        px = hh * ww * batch * c[i] * BF16
        ops.append(elementwise_floor(f"bn_bwd_level{i + 1}", 4 * px))
    for i in range(4):
        hh, ww = dims[i]
        px = hh * ww * batch * c[i] * BF16
        ops.append(elementwise_floor(f"bn_bwd_dec_level{i + 1}", 4 * px))

    # Heads (fused 1x1, 32->2) fwd + bwd; loss; augment chain; optimizer.
    px1 = h * w * batch
    d1_b = px1 * c[0] * BF16
    ops.append(elementwise_floor("heads.fwd", d1_b + px1 * 2 * 4))
    ops.append(elementwise_floor("heads.bwd", 2 * d1_b + 2 * px1 * 2 * 4))
    ops.append(elementwise_floor("loss_fwd_bwd", 6 * px1 * 4))
    # augment: u8 in, bf16 out, one noise pass
    ops.append(elementwise_floor("augment", px1 * 6 * 1 + 2 * px1 * 6 * BF16))
    ops.append(elementwise_floor("adamw", 7.76e6 * 4 * 6))

    total_floor = sum(o["floor_ms"] for o in ops)
    byte_total = sum(o["byte_floor_ms"] for o in ops)
    result = {
        "config": {"batch": batch, "height": h, "width": w, "base": base},
        "assumptions": {
            "hbm_gibps": HBM_GIBPS,
            "fwd_conv_rates_tflops_by_cout": FWD_RATE,
            "fgrad_rates_tflops_by_cout": FGRAD_RATE,
            "note": "rates are the best values measured on THIS chip by "
                    "scripts/profile_ops.py per output-channel tier; floors "
                    "assume perfect fusion (each tensor read/written once "
                    "per pass) and zero overlap inefficiency. This is a "
                    "CALIBRATED COST MODEL, not a provable lower bound: "
                    "demonstrated rates may understate what is achievable, "
                    "and some separately-counted elementwise passes (bn_bwd, "
                    "concat_bwd) are partially fused into conv reads by XLA "
                    "— the true realizable floor sits in a ~105-120 ms band "
                    "around the model's total",
        },
        "total_floor_ms_per_step": round(total_floor, 1),
        "floor_pairs_per_sec": round(1e3 * batch / total_floor, 0),
        "byte_floor_share": round(byte_total / total_floor, 2),
        "ops": [
            {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in o.items()}
            for o in sorted(ops, key=lambda o: -o["floor_ms"])
        ],
    }
    print(json.dumps({k: result[k] for k in
                      ("total_floor_ms_per_step", "floor_pairs_per_sec",
                       "byte_floor_share")}))
    out_path = "docs/floor_analysis.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
