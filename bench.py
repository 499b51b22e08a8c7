"""Driver benchmark: composite per-image cost on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The line is emitted even if the driver kills this process mid-run
(SIGTERM/SIGINT handler + atexit flush print whatever was collected), so
a wall-clock kill can never yield an empty tail (round-3 review Weak #1:
BENCH_r03 was rc=124 with no output because round 3 ran 13 parts x 1800 s
timeouts and printed only at the very end).

Parts (all in ONE bench_full.py child that frees HBM between parts — the
relay charges a 68-302 s toll on a process's FIRST compile, so per-part
subprocesses paid it 7x; results stream back one JSON line per part):

  stage1_500step_s    full 500-step SR3 ancestral loop @224^2 (shipped val
                      schedule, configs/sr_sr3.json:65-70)
  sdxl_step_64lat_s   one CFG-doubled SDXL+ControlNet denoise step @64^2
                      latent (512px image)
  sdxl_step_128lat_s  the same step at the PRODUCTION 128^2 latent — the
                      reference's PIL2Tensor(min_size=1024) path
                      (models/util.py:132-156, infer.py:47)
  vae_decode_512px_s / vae_decode_1024px_s   SDXL VAE decode at both
  llama8B_int8_tok_s  MEASURED full-8B-geometry int8 decode tok/s
  llama8B_prefill_3584_s  anyres-scale 3584-token prefill
  e2e_1024            ONE REAL pipeline process() wall clock at the
                      1024px path (full-scale synthetic weights) + the
                      run's measured DFBCache hit-rate trace
  llama_int4 / caption_probe   int4 decode tok/s + its int4-vs-int8
                      fidelity evidence; self-draft speculative tok/s +
                      Leviathan acceptance at the 8B geometry

value = composite e2e seconds/image at the 512px path (round-2 contract):
  stage1 + 50*sdxl_step + 2*vae_decode + prefill + 256/llama_tok_s
At the 1024px production path the headline (composite_s_per_image_1024px)
is ANCHORED ON THE MEASURED e2e wall clock when the e2e part ran
(e2e_measured + the measured caption terms); the arithmetic stage sum
stays on the line (composite_arith_s_per_image_1024px) with a
reconciliation delta against the DFB-hit-rate-adjusted expectation
(e2e_vs_composite_delta_pct). The arithmetic composites count zero cache
hits; composite_s_per_image_1024px_cached prices the measured hit rate
in, and composite_s_per_image_1024px_int4 swaps the caption decode to
int4 gated on the measured fidelity probe.

Informational parts (hbm_peak, int4/bf16 llama, serving engine, trainers,
flash kernels) are gated behind BENCH_FULL=1 — by default only the
composite-required parts run so the whole bench fits the driver's wall
clock (default budget 2400 s, 300 s per part; BENCH_BUDGET_S /
BENCH_PART_TIMEOUT_S override — the budget is generous because the
relay's per-process first-compile toll is unbounded on a congested day
and a kill mid-run still emits the line).

vs_baseline uses a documented ASSUMPTION for the torch/CUDA reference,
which publishes no latency numbers (BASELINE.md): ~60 s/image — 500 SR3
UNet steps at ~10 steps/s on its GPU (PyTorch 2.5 + CUDA 12.4, ~100M-param
pixel-space UNet with 784-token full attention) plus ~10 s for captioning +
50 CFG-doubled SDXL steps. vs_baseline = ref_seconds / our_seconds; >= 3.0
meets the BASELINE.json north-star. The assumption is self-described in
the JSON line as ref_assumed_s.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import subprocess
import sys
import time

ASSUMED_REF_S_PER_IMAGE = 60.0

HERE = os.path.dirname(os.path.abspath(__file__))

# composite-required parts, priority order: the 512px composite terms
# first (the round-1/2 contract and the fallback metric), then the
# production-resolution terms, then the round-5 measurement parts (the
# TRUE e2e wall clock + DFB hit trace, and the caption accelerator
# evidence: int4 fidelity + self-draft acceptance).
REQUIRED_PARTS = ("stage1", "sdxl", "llama_int8", "vae",
                  "sdxl_1024", "vae_1024", "llama_prefill",
                  "e2e_1024", "llama_int4", "caption_probe")
# informational parts (BENCH_FULL=1): serving/training/kernel columns
FULL_PARTS = ("hbm_peak", "llama", "engine", "sr3_train",
              "qlora_train", "llama_int8kv", "flash_bwd", "flash_fwd",
              "flash_roofline", "sdxl_profile")

# parts whose re-armed clock must exceed the default part timeout:
# sdxl_1024 ran 247 s of a 300 s clock on a congested relay day (round-4
# review Weak #4); e2e_1024 pays a full-scale weight init plus the whole
# pipeline's compiles (measured 783 s wall when the init ran on host —
# the on-device bf16 init cut that to ~118 s warm, but the clock keeps
# the old slack for a congested/cold-cache day); caption_probe generates
# + quantizes an 8B tree twice (measured 320 s warm). Values are caps on
# HANGS, not budgets — the overall BENCH_BUDGET_S still bounds the run
# and the kill-safe emitter keeps whatever completed.
PART_TIMEOUTS = {"sdxl_1024": 480.0, "e2e_1024": 1400.0,
                 "caption_probe": 720.0,
                 # BENCH_FULL tier: sr3_train measured 343 s and
                 # sdxl_profile 1732 s cold (both beyond the 300 s
                 # default — a FULL run killed them before round 5 added
                 # these clocks)
                 "sr3_train": 600.0, "sdxl_profile": 1900.0}

# parts that live in their own driver script (everything else is a
# bench_full.py part name). 8h8 = 8 slots with an 8-step decode horizon
# (multi-step scheduling — tokens per dispatch amortize the host sync).
PART_CMDS = {"engine": ("bench_engine.py", "8", "8h8")}

# results collected so far — read by the emergency emitter
RES: dict = {}
_EMITTED = False
# the in-flight part subprocess — killed by the signal handler so a
# driver kill doesn't leave an orphan squatting on the TPU
_CHILD: list = []


# Resolve libc at MODULE scope: preexec_fn runs between fork() and exec()
# in a multithreaded parent (pump threads from a previous stream_parts
# child), where importing a module / dlopen can deadlock on a lock some
# other thread held at fork time. Calling a pre-resolved function pointer
# is async-signal-safe enough for this one prctl.
try:
    import ctypes
    _PRCTL = ctypes.CDLL("libc.so.6", use_errno=True).prctl
except Exception:  # pragma: no cover - non-Linux
    _PRCTL = None


def _die_with_parent():  # pragma: no cover - child-process preexec
    """PR_SET_PDEATHSIG: the part child is SIGKILLed by the kernel the
    moment bench.py dies — closes the race where a driver kill lands
    while Popen is mid-spawn (before _CHILD is armed), which left an
    orphan part squatting on the TPU (observed from the SIGTERM contract
    test, round 5)."""
    if _PRCTL is not None:
        try:
            _PRCTL(1, signal.SIGKILL)
        except Exception:
            pass  # fall back to the _CHILD kill in the handler


def run_part(name: str, timeout_s: float) -> dict:
    script, *extra = PART_CMDS.get(name, ("bench_full.py", name))
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(HERE, script), *extra],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        preexec_fn=_die_with_parent)
    _CHILD[:] = [proc]
    try:
        stdout, stderr = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        # never break the one-JSON-line contract on a hung part
        return {f"{name}_error": f"timeout after {int(timeout_s)}s"}
    finally:
        _CHILD[:] = []
    # wall time incl. subprocess jax import + compile — the part-budget
    # audit trail (a timeout above is diagnosable from its siblings)
    wall = {f"{name}_part_s": round(time.time() - t0, 1)}
    if not stdout.strip():
        # a silent crash must not masquerade as an empty result
        return {f"{name}_error":
                f"rc={proc.returncode} " + (stderr or "").strip()[-200:],
                **wall}
    line = stdout.strip().splitlines()[-1]
    try:
        return {**json.loads(line), **wall}
    except json.JSONDecodeError:
        return {f"{name}_error": (stderr or stdout).strip()[-200:], **wall}


def stream_parts(parts, deadline: float, first_timeout: float,
                 part_timeout: float):
    """Run `parts` in ONE bench_full.py child, merging its one-JSON-line-
    per-part stream into RES as lines arrive.

    Returns (pending_parts, stderr_tail, respawn_clean): pending[0] is
    the part that hung/crashed (parts complete strictly in argv order) —
    UNLESS respawn_clean is True, in which case every pending part is
    innocent: a completed part reported a RESOURCE_EXHAUSTED error, which
    can leave the relay device wedged for everything after it in the same
    child (observed round 5: a profile-part OOM made the next part fail
    in 0.6 s), so the caller should respawn the rest in a fresh child
    without dropping any of them.

    Why one child for all parts (round-4 relay finding): the FIRST compile
    of a process pays a congestion-dependent toll through the axon
    remote-compile relay — measured 68-302 s even for a trivial `v+1`
    program — and every later compile in the same process is ~0.5-2 s.
    Per-part subprocesses paid that toll per PART (7x), which is what blew
    round 3's driver wall clock; one child pays it once. The child frees
    HBM between parts so model families still never share the chip.

    first_timeout covers the toll + the first part; each completed part
    re-arms the clock at part_timeout."""
    import queue
    import threading

    proc = subprocess.Popen(
        [sys.executable, os.path.join(HERE, "bench_full.py"), *parts],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        preexec_fn=_die_with_parent)
    _CHILD[:] = [proc]
    q: "queue.Queue" = queue.Queue()

    def pump(pipe, tag):
        for line in pipe:
            q.put((tag, line))
        q.put((tag + "_eof", ""))

    for pipe, tag in ((proc.stdout, "out"), (proc.stderr, "err")):
        threading.Thread(target=pump, args=(pipe, tag), daemon=True).start()

    def _pt(name):
        # per-part hang clocks (PART_TIMEOUTS); part_timeout is the default
        return (part_timeout.get(name, part_timeout.get("default", 300.0))
                if isinstance(part_timeout, dict)
                else max(part_timeout, PART_TIMEOUTS.get(name, 0.0)))

    pending = list(parts)
    stderr_tail: list = []
    respawn_clean = False
    t_arm = time.time()
    timeout_cur = max(first_timeout, _pt(pending[0]) if pending else 0.0)
    try:
        while pending:
            wait = min(t_arm + timeout_cur, deadline) - time.time()
            if wait <= 0:
                break  # current part hung past its clock (or budget out)
            try:
                tag, line = q.get(timeout=wait)
            except queue.Empty:
                break
            if tag == "err":
                stderr_tail.append(line)
                del stderr_tail[:-30]
                continue
            if tag.endswith("_eof"):
                if tag == "out_eof":
                    break  # child exited; anything left in pending crashed
                continue
            try:
                obj = json.loads(line.strip())
            except (json.JSONDecodeError, ValueError):
                continue
            name = obj.pop("part", None)
            RES.update(obj)
            if name in pending:
                pending.remove(name)
                t_arm = time.time()
                timeout_cur = _pt(pending[0]) if pending else 300.0
                if pending and any(
                        k.endswith("_error")
                        and "RESOURCE_EXHAUSTED" in str(v)
                        for k, v in obj.items()):
                    respawn_clean = True
                    break
    finally:
        if proc.poll() is None:
            proc.kill()
        _CHILD[:] = []
    return pending, stderr_tail, respawn_clean


def _publish(obj: dict) -> None:
    """Print the one JSON line AND mirror it to an untracked local file.

    The file is a forensic backstop: if the driver's stdout capture is
    ever lost (round-3's BENCH_r03 recorded an empty tail), the line
    still exists on disk for a later audit. Self-reported, not a
    substitute for the driver's own record."""
    line = json.dumps(obj)
    print(line, flush=True)
    try:
        # RSVLDM_BENCH_MIRROR: tests redirect the mirror to a tmp path so
        # running the suite can't delete the last REAL run's backstop
        path = os.environ.get("RSVLDM_BENCH_MIRROR",
                              os.path.join(HERE, "BENCH_LOCAL_LAST.json"))
        with open(path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # never fail the contract over the mirror


def emit() -> None:
    """Build and print the ONE JSON line from whatever RES holds now.

    Runs exactly once — called at normal completion, from the SIGTERM/
    SIGINT handlers, and from atexit as a last resort."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    res = RES
    extras = {"ref_assumed_s": ASSUMED_REF_S_PER_IMAGE}
    if "stage1_500step_s" in res:
        extras["sr3_steps_per_sec"] = round(500 / res["stage1_500step_s"], 2)
    if "sdxl_step_64lat_s" in res:
        extras["sdxl_step_ms"] = round(1000 * res["sdxl_step_64lat_s"], 1)
    if "sdxl_step_128lat_s" in res:
        extras["sdxl_step_1024px_ms"] = round(
            1000 * res["sdxl_step_128lat_s"], 1)
    if "sdxl_step_hit_s" in res:
        # informational: a DFBCache-HIT step (ControlNet + UNet input
        # blocks + similarity test; lax.cond skips the middle/decoder).
        # The composite counts zero hits — the hit rate is data-dependent —
        # so [hit, miss] step times bound the cache-active composite.
        extras["sdxl_step_hit_ms"] = round(1000 * res["sdxl_step_hit_s"], 1)
    if "sdxl_step_128lat_hit_s" in res:
        extras["sdxl_step_1024px_hit_ms"] = round(
            1000 * res["sdxl_step_128lat_hit_s"], 1)
    if "vae_decode_512px_s" in res:
        extras["vae_decode_ms"] = round(1000 * res["vae_decode_512px_s"], 1)
    if "vae_decode_1024px_s" in res:
        extras["vae_decode_1024px_ms"] = round(
            1000 * res["vae_decode_1024px_s"], 1)
    for k in ("llama8B_est_tok_s", "llama8B_int8_tok_s", "llama8B_int4_tok_s",
              "llama8B_int8kv_tok_s", "llama2B_tok_s",
              "engine_8slot_agg_tok_s", "sr3_train_img_s",
              "qlora8B_train_tok_s", "hbm_read_gbs_measured",
              "hbm_read_pct_of_peak"):
        if k in res:
            v = res[k]
            extras[k] = round(v, 1) if isinstance(v, float) else v
    # informational: Pallas flash kernels (fwd; fused bwd vs XLA recompute)
    # + the SDXL per-component step split (PERF.md anchors on it) + every
    # serving-engine spec (the h>1 decode-horizon tags were dropped by
    # the old explicit-key list)
    extras.update({k: v for k, v in res.items()
                   if k.startswith(("flash_bwd_", "flash_fwd_",
                                    "flash_roofline_", "sdxlprof_",
                                    "engine_"))})
    # roofline columns (compiled-program cost_analysis vs v5e ceilings)
    extras.update({k: v for k, v in res.items()
                   if k.endswith("_mfu_pct") or k.endswith("_hbm_pct")})
    if any(k.endswith("_mfu_pct") or k.endswith("_hbm_pct")
           for k in extras):
        # round-4 review Weak #5: >100% columns must be self-describing on
        # the driver line, not only in PERF.md
        extras["pct_note"] = (
            ">100% is legitimate: mfu_pct normalizes to the bf16 MXU peak "
            "(int8 MXU ops run ~2x it) and cost_analysis 'bytes accessed' "
            "counts VMEM-reused reads, so hbm_pct>100 marks fused reuse, "
            "not impossible bandwidth (PERF.md §4)")
    # round-5 measurement keys: caption accelerator evidence + the DFB
    # hit trace ride the line verbatim (their notes are added below)
    extras.update({k: v for k, v in res.items()
                   if k.startswith(("caption_selfdraft_", "int4_vs_int8_",
                                    "dfb_", "e2e_"))
                   and not k.endswith(("_error", "_part_s"))})
    # part failures/skips + per-part wall clock are self-describing
    extras.update({k: v for k, v in res.items()
                   if k.endswith("_error") or k.endswith("_part_s")})

    # caption term: the MEASURED full-geometry int8 decode (round-2 review
    # Weak #1), bf16 proxy as fallback; the measured anyres prefill joins
    # when available (0.0 fallback keeps partial runs comparable — its
    # absence is visible in the extras)
    tok_s = res.get("llama8B_int8_tok_s") or res.get("llama8B_est_tok_s")
    prefill = res.get("llama8B_prefill_3584_s", 0.0)
    if prefill:
        extras["llama8B_prefill_s"] = round(prefill, 2)
    caption_s = (prefill + 256 / tok_s) if tok_s else None

    needed = ("stage1_500step_s", "sdxl_step_64lat_s", "vae_decode_512px_s")
    if all(k in res for k in needed) and caption_s is not None:
        composite = (res["stage1_500step_s"] + 50 * res["sdxl_step_64lat_s"]
                     + 2 * res["vae_decode_512px_s"] + caption_s)
        # when the e2e part also measured the 512px path, the headline
        # `value` is a real process() wall clock + caption terms (the
        # metric name drops its `_est` suffix); the arithmetic sum stays
        # on the line for comparison
        metric_name = "e2e_seconds_per_image_512px_est"
        meas512 = res.get("e2e_measured_s_per_image_512px")
        if meas512 is not None:
            extras["composite_arith_s_per_image_512px"] = round(composite, 2)
            composite = meas512 + caption_s
            metric_name = "e2e_seconds_per_image_512px"
        extras["composite_s_per_image"] = round(composite, 2)
        # the PRODUCTION path: min_size=1024 -> 128^2 latent + 1024px decode
        if "sdxl_step_128lat_s" in res and "vae_decode_1024px_s" in res:
            comp1024 = (res["stage1_500step_s"]
                        + 50 * res["sdxl_step_128lat_s"]
                        + 2 * res["vae_decode_1024px_s"] + caption_s)
            extras["composite_arith_s_per_image_1024px"] = round(comp1024, 2)
            # MEASURED e2e wall clock (round-4 review item 1): when the
            # e2e part ran, it — not the arithmetic stage sum — anchors
            # the headline 1024px number. The reconciliation delta
            # compares the measured no-caption wall clock against the
            # stage sum ADJUSTED for the run's own measured DFB hit rate
            # (the measured clock natively contains the cache savings the
            # zero-hit arithmetic sum excludes).
            meas = res.get("e2e_measured_s_per_image_1024px")
            if meas is not None:
                r_hit = res.get("dfb_hit_rate", 0.0)
                step_miss = res["sdxl_step_128lat_s"]
                step_hit = res.get("sdxl_step_128lat_hit_s", step_miss)
                sdxl_s = 50 * ((1 - r_hit) * step_miss + r_hit * step_hit)
                expect = (res["stage1_500step_s"] + sdxl_s
                          + 2 * res["vae_decode_1024px_s"])
                extras["e2e_vs_composite_delta_pct"] = round(
                    100.0 * (meas - expect) / expect, 1)
                extras["e2e_note"] = (
                    "e2e_measured = one real pipeline process() wall clock "
                    "at the 1024px path (full-scale synthetic weights, "
                    "captioner off: it cannot co-reside with SDXL on one "
                    "16GB chip); headline composite_s_per_image_1024px = "
                    "e2e_measured + measured caption terms; delta vs the "
                    "dfb-hit-rate-adjusted arithmetic stage sum")
                comp1024 = meas + caption_s
                # the cache-OFF wall clock is weight-independent (no DFB
                # hit-rate dependence) — reconcile it against the zero-hit
                # arithmetic stage sum directly
                nocache = res.get("e2e_measured_nocache_s_per_image_1024px")
                if nocache is not None:
                    expect_nc = (res["stage1_500step_s"] + 50 * step_miss
                                 + 2 * res["vae_decode_1024px_s"])
                    extras["e2e_nocache_vs_arith_delta_pct"] = round(
                        100.0 * (nocache - expect_nc) / expect_nc, 1)
            # DFBCache-active arithmetic estimate at the measured hit rate
            # (round-4 review item 3) — the [hit,miss] bound collapsed to
            # a point by the e2e run's real trajectory trace
            if "dfb_hit_rate" in res and "sdxl_step_128lat_hit_s" in res:
                r_hit = res["dfb_hit_rate"]
                cached = (res["stage1_500step_s"]
                          + 50 * ((1 - r_hit) * res["sdxl_step_128lat_s"]
                                  + r_hit * res["sdxl_step_128lat_hit_s"])
                          + 2 * res["vae_decode_1024px_s"] + caption_s)
                extras["composite_s_per_image_1024px_cached"] = round(
                    cached, 2)
                extras["dfb_note"] = (
                    "hit rate measured on a real 50-step threshold-0.3 "
                    "trajectory with synthetic full-scale weights — real "
                    "checkpoints shift it")
            # int4 caption variant, gated on the fidelity probe's evidence
            # (round-4 review item 2): only claim the faster decode when
            # the greedy streams agree
            tok4 = res.get("llama8B_int4_tok_s")
            if (tok4 and res.get("int4_vs_int8_greedy_match_pct", 0) >= 90
                    and "sdxl_step_128lat_s" in res):
                cap4 = prefill + 256 / tok4
                extras["composite_s_per_image_1024px_int4"] = round(
                    comp1024 - caption_s + cap4, 2)
                extras["int4_note"] = (
                    "int4 caption variant gated on the measured int4-vs-"
                    "int8 greedy agreement (synthetic weights: no trained "
                    "outliers, treat as upper bound)")
            extras["composite_s_per_image_1024px"] = round(comp1024, 2)
            extras["vs_baseline_1024px"] = round(
                ASSUMED_REF_S_PER_IMAGE / comp1024, 2)
        _publish({
            "metric": metric_name,
            "value": round(composite, 2),
            "unit": "s/image",
            "vs_baseline": round(ASSUMED_REF_S_PER_IMAGE / composite, 2),
            **extras,
        })
        return
    # fallback: report the Stage-1 metric (round-1 contract) + any errors
    sps = extras.get("sr3_steps_per_sec", 0.0)
    _publish({
        "metric": "sr3_unet_denoise_steps_per_sec_224px",
        "value": sps,
        "unit": "steps/s",
        "vs_baseline": round(sps / 10.0, 2),
        **extras,
    })


def _on_signal(signum, frame):  # pragma: no cover - driver-kill path
    for proc in _CHILD:  # don't leave an orphan part on the TPU
        try:
            proc.kill()
        except OSError:
            pass
    RES[f"signal_{signum}_error"] = "killed mid-run; partial results"
    emit()
    # exit 0: the JSON line above is valid (and self-describes the kill);
    # a 124/143 rc must not make the driver discard it
    os._exit(0)


# Arm the kill-safety net the moment the script body runs, not inside
# main(): interpreter startup (sitecustomize + axon plugin) measures
# ~2.3 s, and a driver SIGTERM landing in that window would hit the
# default disposition and produce an empty tail — the exact round-3
# failure. The stderr marker lets tests (and a human) synchronize on
# "handlers live" without racing. Guarded so `import bench` stays
# side-effect-free.
if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    atexit.register(emit)
    print("bench: signal handlers armed", file=sys.stderr, flush=True)


def main():
    # 2400 not 900: the axon relay's per-process first-compile toll is
    # congestion-dependent and unbounded in practice (68-463 s measured in
    # round 4; >600 s for a trivial v+1 observed 2026-08-20 on a cold
    # cache) — a 900 s budget can lose EVERY part to one bad day. A large
    # budget is now strictly safe: the SIGTERM/atexit emitter means a
    # driver kill still yields the one JSON line with whatever completed,
    # so the only effect of a generous budget is more parts captured.
    # 3000 (round 5): a warm-cache full required run measures ~1600 s of
    # parts; one cold-toll absorption (observed 1300 s on stage1 when the
    # cache was empty) must not evict the round-5 measurement parts at
    # the tail of the priority list.
    budget = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    # 300 not 240: the sdxl_1024 part measured 228 s wall on a congested
    # relay day (rc=0 run, 2026-08-19) — 240 left 12 s of margin between
    # "slow relay" and "lose the production-resolution composite". The
    # budget still caps the whole run; this clock only catches hangs.
    part_timeout = float(os.environ.get("BENCH_PART_TIMEOUT_S", "300"))
    # the first part of each child absorbs the relay's first-compile toll
    # (measured 68-463 s, congestion-dependent) on top of its own work;
    # killing a merely-slow child re-pays the toll, so the warm-up clock
    # is generous: most of the budget, never under 480 s
    first_timeout = float(os.environ.get(
        "BENCH_WARMUP_TIMEOUT_S", str(max(480.0, 0.7 * budget))))
    # signal handlers + atexit are armed at module import (see _on_signal)
    deadline = time.time() + budget
    parts = list(REQUIRED_PARTS)
    if os.environ.get("BENCH_FULL"):
        parts += list(FULL_PARTS)

    # all bench_full parts ride ONE child (see stream_parts); a hang or
    # crash drops the offending part and respawns with the rest
    pending = [p for p in parts if p not in PART_CMDS]
    attempt = 0
    while pending and time.time() < deadline - 30 and attempt < 3:
        attempt += 1
        n_before = len(pending)
        pending, errs, respawn_clean = stream_parts(
            pending, deadline, first_timeout, part_timeout)
        if respawn_clean:
            # an OOM part may have wedged the child's device; every
            # pending part is innocent — fresh child. Such a round made
            # progress (the OOM part completed and left pending), so it
            # must not consume one of the 3 hang-recovery attempts —
            # otherwise two OOM days plus one hang would evict innocent
            # tail parts with budget remaining.
            if len(pending) < n_before:
                attempt -= 1
            continue
        if pending and time.time() < deadline - 30:
            bad = pending.pop(0)
            RES[f"{bad}_error"] = (f"hung/crashed (attempt {attempt}): "
                                   + "".join(errs)[-200:]).strip()
    for name in pending:
        # self-describing skip reason: the loop exits on the deadline OR
        # on the respawn-attempt cap — label which one actually happened
        RES.setdefault(f"{name}_error",
                       "skipped: bench budget exceeded"
                       if time.time() >= deadline - 30
                       else f"skipped: {attempt} child respawns exhausted")

    # parts with their own driver script (serving engine) stay per-process
    # — each new process pays the relay's first-compile toll itself, so it
    # gets the warm-up clock, not the (re-armed, already-warm) part clock
    for name in (p for p in parts if p in PART_CMDS):
        left = deadline - time.time()
        if left < 30:
            RES[f"{name}_error"] = "skipped: bench budget exceeded"
            continue
        RES.update(run_part(name, timeout_s=min(max(part_timeout,
                                                    first_timeout), left)))
    emit()


if __name__ == "__main__":
    main()
