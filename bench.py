"""Benchmark: flagship CT-GAN training throughput on the available device.

Workload = the reference's headline config (CT_gan_cifar_resnet.py): CIFAR-10
conditional ResNet/ACGAN CT-GAN, DIM 128, critic batch 64, 5 critic steps +
1 generator step (batch 128) per iteration, full CT + gradient-penalty
double backward + ACGAN heads — the complete training iteration, fused into
one jitted program, data resident in HBM.

Metric: real training images consumed per second per chip
(= batch_size * critic_iters / sec-per-iteration).

Baseline: the reference publishes no throughput (BASELINE.md) — it measured
a per-iter 'time' metric but never reported it.  vs_baseline therefore divides
by a RECONSTRUCTED ~230 images/sec TF-1.2 figure (arithmetic + uncertainty in
BASELINE.md "Reconstructed TF-1.2 throughput baseline"); the JSON labels it
vs_baseline_kind=estimated_vs_reconstructed_tf12.  The headline numbers are
the absolute ones: sec_per_iter and the workload's own roofline account
(hbm_floor_sec from tools/cost_analysis.py — flops/bytes involve no
reference reconstruction).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 230.0  # see module docstring

# The single tunneled chip is serialized on this PID-liveness lockfile by the
# training queues (tools/run_queue_*.sh).  The tunnel claim is exclusive: a
# second claimant blocks until the first exits, so a bench fired while a
# queue leg trains would watchdog out (exit 7) on every retry and record a
# degraded 0.0 artifact.  The supervisor therefore acquires the lock before
# spawning measurement children: wait up to CTGAN_BENCH_LOCK_WAIT seconds
# (default 600) for the holder to finish, then preempt its process tree —
# every queue leg checkpoints and resumes by contract, so preemption costs
# at most one checkpoint interval, while a lost headline bench costs the
# round its only hardware number.
CHIP_LOCK = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "runs", "chip.lock"
)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    try:
        # A SIGTERM'd child we have not reaped is a zombie: signalable but
        # gone for chip-occupancy purposes.
        with open(f"/proc/{pid}/stat") as f:
            stat = f.read()
        return stat.rsplit(")", 1)[1].split()[0] != "Z"
    except (OSError, IndexError):
        return False


def _descendants(pid: int) -> list[int]:
    """Transitive children of `pid` via /proc (exact PIDs, no name matching)."""
    out, frontier = [], [pid]
    while frontier:
        p = frontier.pop()
        try:
            tasks = os.listdir(f"/proc/{p}/task")
        except OSError:
            continue
        for t in tasks:
            try:
                with open(f"/proc/{p}/task/{t}/children") as f:
                    kids = [int(c) for c in f.read().split()]
            except (OSError, ValueError):
                continue
            out.extend(kids)
            frontier.extend(kids)
    return out


def _preempt_tree(holder: int) -> None:
    """SIGTERM (then SIGKILL) the lock holder and its whole subtree.

    Holder first: queue scripts trap EXIT to remove the lock and must not
    relaunch the leg we are about to kill."""
    tree = [holder] + _descendants(holder)
    print(f"bench: preempting chip-lock holder {holder} (tree {tree})",
          file=sys.stderr, flush=True)
    for sig, grace in ((signal.SIGTERM, 15.0), (signal.SIGKILL, 2.0)):
        for p in tree:
            try:
                os.kill(p, sig)
            except OSError:
                pass
        deadline = time.time() + grace
        while time.time() < deadline and any(_pid_alive(p) for p in tree):
            time.sleep(0.5)
        tree = [p for p in tree if _pid_alive(p)]
        if not tree:
            break


def _read_lock_holder() -> int | None:
    try:
        with open(CHIP_LOCK) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _release_chip_lock() -> None:
    if _read_lock_holder() == os.getpid():
        try:
            os.remove(CHIP_LOCK)
        except OSError:
            pass


def _acquire_chip_lock() -> None:
    max_wait = float(os.environ.get("CTGAN_BENCH_LOCK_WAIT", "600"))
    deadline = time.time() + max_wait
    waited = False
    while True:
        holder = _read_lock_holder()
        if holder is None or holder == os.getpid() or not _pid_alive(holder):
            break
        if time.time() >= deadline:
            # Claim first so a queue waiting on the lock never sees a free
            # window while we preempt; the holder's EXIT trap may still
            # rm the file, so the post-loop write below re-heals it.
            with open(CHIP_LOCK, "w") as f:
                f.write(str(os.getpid()))
            _preempt_tree(holder)
            break
        if not waited:
            print(f"bench: chip.lock held by live pid {holder}; waiting up to "
                  f"{max_wait:.0f}s for the queue leg to finish",
                  file=sys.stderr, flush=True)
            waited = True
        time.sleep(5)
    os.makedirs(os.path.dirname(CHIP_LOCK), exist_ok=True)
    with open(CHIP_LOCK, "w") as f:
        f.write(str(os.getpid()))
    import atexit

    atexit.register(_release_chip_lock)

BATCH = 64
CRITIC_ITERS = 5
DIM = 128
WARMUP_ITERS = 3
MEASURE_ITERS = 20

METRIC_NAME = "cifar_resnet_ctgan_train_images_per_sec_per_chip"
UNIT = "images/sec/chip"


def _device_watchdog(timeout_s: float = 180.0):
    """Fail fast if backend init hangs (a wedged TPU tunnel claim blocks
    forever otherwise).  Exit code 7 tells the parent retry loop the
    backend never came up (vs a measurement crash)."""
    import os
    import threading

    import jax

    done = threading.Event()

    def probe():
        try:
            jax.devices()
            done.set()
        except Exception:
            done.set()
            raise

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        import sys

        print(
            f"bench: device init did not complete within {timeout_s:.0f}s "
            "(TPU tunnel claim appears wedged); aborting attempt",
            file=sys.stderr, flush=True,
        )
        os._exit(7)


def _supervise() -> None:
    """Run the measurement in a subprocess with bounded retries + backoff.

    The round-1 failure mode was a wedged TPU tunnel: the old bench detected
    it but just exited 1, costing the round its only hardware number
    (VERDICT.md "What's weak" #2).  Now: up to 3 attempts, each in a fresh
    process (a wedged PJRT client cannot be retried in-process), and if all
    fail we still print ONE parseable JSON line describing the failure and
    exit 0 so the driver records a degraded artifact instead of rc=1.
    """
    import subprocess

    _acquire_chip_lock()
    attempts = 3
    child_timeout = [900, 600, 600]
    backoff = [20, 40]
    errors = []
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                timeout=child_timeout[i],
                text=True,
            )
            out = proc.stdout or ""
            for line in reversed(out.strip().splitlines()):
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    print(line)
                    return
            errors.append(f"attempt {i + 1}: rc={proc.returncode}, no JSON; tail: {out[-300:]!r}")
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {i + 1}: timed out after {child_timeout[i]}s")
        if i < attempts - 1:
            time.sleep(backoff[i])
    print(
        json.dumps(
            {
                "metric": METRIC_NAME,
                "value": 0.0,
                "unit": UNIT,
                "vs_baseline": 0.0,
                "vs_baseline_kind": "estimated_vs_reconstructed_tf12",
                "error": "; ".join(errors)[-900:],
            }
        )
    )


def main() -> None:
    _device_watchdog()

    import jax
    import jax.numpy as jnp

    from ctgan_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from ctgan_tpu.core import default_tpu_policy
    from ctgan_tpu.data.synthetic import synthetic_cifar10
    from ctgan_tpu.models import resnet_cifar
    from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer
    from __graft_entry__ import _init_flagship

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu)
    if on_tpu:
        # Pallas on-core-PRNG dropout: +10% step time vs jax.random threefry
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    cfg_model = resnet_cifar.ResnetCifarConfig(dim_g=DIM, dim_d=DIM)
    cfg = AcganConfig(batch_size=BATCH, critic_iters=CRITIC_ITERS, iters=100000)

    def gen_fn(n, labels, noise=None):
        return resnet_cifar.generator(n, labels, noise=noise, cfg=cfg_model)

    def disc_fn(x, labels, kp1, kp2, kp3):
        return resnet_cifar.discriminator(x, labels, kp1, kp2, kp3, cfg_model)

    init_state, step_fn, _s, _g, _d = make_acgan_trainer(gen_fn, disc_fn, cfg)
    gen_params, disc_params = _init_flagship(cfg_model)
    state = init_state(gen_params, disc_params)

    # HBM-resident data; one stacked [K, B] batch per iteration
    (train_x, train_y), _ = synthetic_cifar10(n_train=BATCH * CRITIC_ITERS * 4)
    from ctgan_tpu.data import DeviceSampler

    sampler = DeviceSampler(
        [train_x.astype("uint8"), train_y.astype("int32")], BATCH, CRITIC_ITERS
    )

    # Timing on the tunneled backend is hostile in BOTH easy directions:
    # block_until_ready under-waits on donated buffers (an impossible
    # 0.0032 s/iter was observed for a step whose HBM roofline is 24 ms),
    # and eager per-iteration ops pay a ~1.4 s relay round trip each
    # (27.8 "s/iter" observed).  So: run K full training iterations inside
    # ONE jitted lax.scan (single dispatch, single value readback) for two
    # window sizes and difference them — constant dispatch/readback/compile
    # overhead cancels exactly, leaving pure per-iteration device time.
    # The shipped apps use DeviceSampler.host_perm (one host-side epoch
    # shuffle, passed through the jit boundary) — the in-trace fallback
    # re-sorts the pool EVERY iteration.  Mirror the app inside the scan:
    # precompute the per-epoch shuffles the window will consume and index
    # the table by epoch in-trace.  CTGAN_BENCH_DATA=intrace keeps the old
    # in-trace-perm body, =fixed feeds one precomputed batch every
    # iteration (pure-step diagnostic; NOT an honest end-to-end number).
    bench_data_mode = os.environ.get("CTGAN_BENCH_DATA", "host_perm")
    ipe = sampler.iters_per_epoch
    n_epochs = (MEASURE_ITERS * 5) // ipe + 1
    perm_table = jnp.stack(
        [sampler.host_perm(e * ipe) for e in range(n_epochs)]
    )
    fixed_batch = sampler.sample(jnp.asarray(0), tuple(sampler.arrays),
                                 sampler.host_perm(0))

    def multi_step(state, data, key, k):
        def body(carry, i):
            if bench_data_mode == "fixed":
                real_stack, label_stack = fixed_batch
            elif bench_data_mode == "intrace":
                real_stack, label_stack = sampler.sample(i, data)
            else:
                perm = jnp.take(perm_table, i // ipe, axis=0)
                real_stack, label_stack = sampler.sample(i, data, perm)
            carry, m = step_fn(carry, real_stack, label_stack, key)
            return carry, m["disc_cost"]

        return jax.lax.scan(body, state, jnp.arange(k))

    from ctgan_tpu.core import tuned_compiler_options

    _opts = tuned_compiler_options()
    jit_multi = jax.jit(multi_step, static_argnums=3, donate_argnums=0,
                        compiler_options=_opts)
    key = jax.random.PRNGKey(0)
    data_args = tuple(sampler.arrays)
    K1, K2 = MEASURE_ITERS, MEASURE_ITERS * 5

    t_compile = time.perf_counter()
    try:
        state1, costs = jit_multi(state, data_args, key, K1)  # compile K1
    except Exception:
        if _opts is None:
            raise
        # Tuned flags rejected (e.g. libtpu revision drift): never lose the
        # headline measurement to a tuning file — fall back to defaults.
        # Rebuild state: if the failure hit at execution (not compile) time,
        # the donated input buffers are already consumed.
        print(f"tuned compiler options rejected, falling back: {_opts}")
        gen_params, disc_params = _init_flagship(cfg_model)  # donated above
        state = init_state(gen_params, disc_params)
        jit_multi = jax.jit(multi_step, static_argnums=3, donate_argnums=0)
        state1, costs = jit_multi(state, data_args, key, K1)
    float(costs[-1])
    state2, costs = jit_multi(state1, data_args, key, K2)  # compile K2
    float(costs[-1])
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    state3, costs = jit_multi(state2, data_args, key, K1)
    final_cost = float(costs[-1])
    t_k1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state4, costs = jit_multi(state3, data_args, key, K2)
    final_cost = float(costs[-1])
    t_k2 = time.perf_counter() - t0
    elapsed = t_k2 - t_k1
    MEASURED = K2 - K1

    from ctgan_tpu.models import blocks

    sec_per_iter = elapsed / MEASURED
    images_per_sec = BATCH * CRITIC_ITERS / sec_per_iter
    # Roofline floors from tools/cost_analysis.py on the real chip:
    # unfused 0.0243 s (r3); fused (FUSE_MEANPOOL_CONV, the shipped
    # default) 0.0185 s (r4, runs/queue_r5a.log job cost_analysis_fused).
    # NB the fused program MEASURES below its byte-model floor (16.8 ms):
    # the model conservatively charges fusion temporaries XLA keeps
    # on-chip, so treat the fused floor as an upper bracket, not a wall.
    hbm_floor = 0.0185 if blocks.FUSE_MEANPOOL_CONV else 0.0243
    result = {
        "metric": METRIC_NAME,
        "value": round(images_per_sec, 2),
        "unit": UNIT,
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
        "vs_baseline_kind": "estimated_vs_reconstructed_tf12",
        "sec_per_iter": round(sec_per_iter, 4),
        "hbm_floor_sec_per_iter": hbm_floor,
        "fuse_meanpool": bool(blocks.FUSE_MEANPOOL_CONV),
        "timing": f"scan-window diff ({K2}-{K1} iters), overhead-cancelling",
        "data_mode": bench_data_mode,
        "window_secs": [round(t_k1, 2), round(t_k2, 2)],
        "compile_plus_warmup_sec": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "config": f"dim={DIM} batch={BATCH} critic_iters={CRITIC_ITERS} mode=wgan-CT+ACGAN",
        "final_disc_cost": final_cost,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    if "--run" in sys.argv:
        main()
    else:
        _supervise()
