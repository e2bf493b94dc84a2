"""Analytical multi-chip scaling projection (VERDICT r2 item #5).

Real multi-chip hardware is not reachable from this environment (one v5e
chip via relay; sharding is validated on the virtual 8-device CPU mesh), so
the >=80%-scaling-efficiency target is projected analytically from
measured single-chip numbers + interconnect specs, with every assumption
recorded in the artifact. Three strategies:

1. spatial/window tiling (implemented: parallel/spatial.py) — upfront
   full-receptive-field halos; efficiency = band / (band + 2*halo)
   (pure redundant-compute model; comm is a host feed, not a collective).
2. spatial per-stage halo exchange (ppermute per conv stage — the
   make_tiled_isp_forward mechanism applied per stage) — no redundant
   compute; efficiency = t_comp / (t_comp + t_comm) with comm = summed halo
   rows over the trunk's convs across ICI.
3. data parallel over hosts (implemented: train/rd.py pjit over 'data') —
   efficiency = t_step / (t_step + t_allreduce(grad bytes over DCN)).

Writes artifacts/scaling_projection_r03.json.
Usage: python tools/scaling_projection.py   (no chip needed)
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

# Interconnect assumptions (stated, conservative):
ICI_GBS = 180.0     # v5e per-chip ICI bandwidth, GB/s (bidirectional aggregate)
DCN_GBS = 25.0      # per-host data-center network, GB/s
PEAK_HBM_GBS = 819.0

ARTS = "/root/repo/artifacts"


def load(path):
    p = os.path.join(ARTS, path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def main():
    from realcamnet_tpu.parallel.spatial import liteisp_rf_radius

    out = {"assumptions": {"ici_gbs": ICI_GBS, "dcn_gbs": DCN_GBS,
                           "note": "single-chip times measured on v5e via "
                                   "relay; interconnects are spec estimates"}}

    bench = (load("../BENCH_r04.json") or load("../BENCH_r03.json")
             or load("../BENCH_r02.json"))
    roof = load("roofline_r03.json")
    ms_frame = None
    if bench:  # driver BENCH files wrap the bench.py JSON under "parsed"
        ms_frame = 1e3 / bench.get("parsed", bench)["value"]
    elif roof:
        ms_frame = roof["pallas_bhcw"]["ms_per_frame"]
    out["measured_4k_isp_ms_per_frame"] = ms_frame

    # --- 1. window tiling with full-RF halos (implemented, exact) ---
    halo_isp = liteisp_rf_radius(n_blocks=4)   # flagship trunk RF, packed rows
    halo_codec = 256                           # window-aligned joint encoder
    tiling = {}
    for frame, hpacked in (("4k", 1088), ("8k", 2176)):
        rows = {}
        for n in (2, 4, 8):
            band = hpacked // n
            recs = {}
            for name, halo in (("isp_rf", halo_isp), ("codec_align", halo_codec)):
                win = band + 2 * halo
                eff = band / win if win <= hpacked else None
                recs[name] = {"halo": halo, "band": band,
                              "eff": round(eff, 3) if eff else None}
            rows[f"n{n}"] = recs
        tiling[frame] = rows
    out["window_tiling"] = tiling
    out["window_tiling_conclusion"] = (
        "Full-RF upfront halos cap spatial scaling well below 80% at 4K "
        f"(halo {halo_isp} rows vs 1088-row frames); exactness-preserving "
        "window tiling is a memory/latency tool, not a throughput scaler. "
        "Throughput scaling uses per-stage halo exchange or data "
        "parallelism (below).")

    # --- 2. per-stage halo exchange (IMPLEMENTED r4:
    # parallel/spatial.py make_staged_halo_isp_forward +
    # LiteISPNet.__call__(halo_axis=...)). Exchange counts below are the
    # exact segment halos the implementation issues for the flagship
    # (nb=4 -> rf_rcag=9, modulation_blocks=1), verified by
    # tests/test_spatial.py::test_staged_halo_matches_unsharded_interior:
    #   segA  r=3   on raw(4ch)+coord(2ch) @ W=1920
    #   down1 r=12  48ch  @1920 | down2 r=12 192ch @960 | down3 r=12 192ch @480
    #   mid: all_gather of the 1/8-scale map (512ch @240, 136 rows at 4K)
    #   up3   r=10 128ch @480 | up2 r=10 48ch @960 | up1 r=10 48ch @1920
    #   tail  r=2   48ch @1920
    # Bytes per chip = 2 sides * r rows * W * C * dtype (bf16).
    B = 2  # bf16 activations (the fused trunk's dtype)
    segs = [("segA", 3, 6, 1920), ("down1", 12, 48, 1920),
            ("down2", 12, 192, 960), ("down3", 12, 192, 480),
            ("up3", 10, 128, 480), ("up2", 10, 48, 960),
            ("up1", 10, 48, 1920), ("tail", 2, 48, 1920)]
    halo_bytes = sum(2 * r * c * w * B for _, r, c, w in segs)
    out["per_stage_exchange"] = {
        "implemented": "parallel/spatial.py make_staged_halo_isp_forward",
        "segments": {name: {"r": r, "c": c, "w": w,
                            "mb": round(2 * r * c * w * B / 1e6, 3)}
                     for name, r, c, w in segs},
    }
    for n in (2, 4, 8):
        gather_bytes = (n - 1) / n * 136 * 240 * 512 * B  # mid all_gather @4K
        comm_bytes = halo_bytes + gather_bytes
        t_comm_ms = comm_bytes / (ICI_GBS * 1e9) * 1e3
        # Replicated middle: its compute is duplicated on every chip. Mid
        # share of the frame estimated from its FLOP fraction (~4%).
        mid_frac = 0.04
        t_comp_ms = (ms_frame or 112.0) * ((1 - mid_frac) / n + mid_frac)
        eff = ((ms_frame or 112.0) / n) / (t_comp_ms + t_comm_ms)
        out["per_stage_exchange"][f"n{n}"] = {
            "halo_mb": round(halo_bytes / 1e6, 2),
            "gather_mb": round(gather_bytes / 1e6, 2),
            "t_comm_ms": round(t_comm_ms, 3),
            "t_comp_ms": round(t_comp_ms, 2),
            "eff": round(eff, 3)}

    # --- 3. data parallel across hosts (training) ---
    sweep = load("rd_sweep_r03.json")
    train = load("train_run_r03.json") or load("train_run_r02.json")
    params_m = 49.22  # flagship raw2bit (measured at init)
    grad_bytes = params_m * 1e6 * 4  # f32 grads
    # ring allreduce moves 2x payload; DCN is the bottleneck across hosts
    t_ar_ms = 2 * grad_bytes / (DCN_GBS * 1e9) * 1e3
    step_ms = None
    if sweep:
        pts = sweep.get("points") or []
        # Last leg: shares the first leg's compile, so its wall time is
        # (nearly) pure training -> the honest steady-state step cost.
        if pts and pts[-1].get("train_s") and pts[-1].get("curve"):
            steps = pts[-1]["curve"][-1]["step"]
            step_ms = pts[-1]["train_s"] / max(steps, 1) * 1e3
    out["data_parallel_hosts"] = {
        "grad_mb": round(grad_bytes / 1e6, 1),
        "t_allreduce_ms": round(t_ar_ms, 1),
        "measured_step_ms": round(step_ms, 1) if step_ms else None,
        "note": "eff = step/(step + allreduce); overlap of grad reduce with "
                "backward (XLA latency hiding) pushes this toward 1.0",
    }
    if step_ms:
        for hosts in (2, 4):
            eff = step_ms / (step_ms + t_ar_ms)
            out["data_parallel_hosts"][f"hosts{hosts}_eff_no_overlap"] = round(eff, 3)
        out["data_parallel_hosts"]["meets_80pct"] = bool(
            step_ms / (step_ms + t_ar_ms) >= 0.8)

    os.makedirs(ARTS, exist_ok=True)
    cpu = load("scaling_staged_halo_cpu_r05.json")
    if cpu:
        out["measured_cpu_mesh"] = cpu
    with open(os.path.join(ARTS, "scaling_projection_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
