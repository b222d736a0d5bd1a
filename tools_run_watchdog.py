#!/usr/bin/env python
"""Stall watchdog + auto-resume for long TPU runs on a flaky device link.

The tunneled relay occasionally wedges a device->host pull forever (the
trainer blocks in jax Array.__array__ with the runtime unrecoverable
in-process). This supervisor restores the reference workflow's implicit
restartability (train_search.py re-loads its checkpoint every epoch,
reference train_search.py:161-163) as an explicit subsystem:

  - launch the trainer detached with the given args;
  - watch its run dir's log.txt mtime;
  - if no progress for --stall_sec: SIGKILL the trainer, wait for the
    relay to answer a probe program again, then relaunch with --resume
    pointing at the newest full checkpoint of any watched run dir.

Usage:
  python tools_run_watchdog.py --save ./checkpoints_e2e --note proxy-e2e \
      --stall_sec 600 -- python train_search.py --img_root ... --save ...

Everything after `--` is the trainer command; the watchdog appends
`--resume <ckpt>` on relaunches (and strips any prior --resume pair).
"""

import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def log(msg):
    print(f"[watchdog {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def newest(pattern):
    paths = glob.glob(pattern)
    return max(paths, key=os.path.getmtime) if paths else None


def latest_ckpt(save_root, ckpt_glob):
    """Newest full checkpoint across this save root's run dirs."""
    ckpts = sorted(glob.glob(os.path.join(save_root, ckpt_glob)),
                   key=os.path.getmtime)
    return ckpts[-1] if ckpts else None


def probe_tpu(timeout=300):
    """True once a trivial device program completes inside `timeout`."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    try:
        subprocess.run([sys.executable, "-c", code], timeout=timeout,
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return True
    except Exception:
        return False


def strip_resume(cmd, flag):
    out, skip = [], False
    for a in cmd:
        if skip:
            skip = False
            continue
        if a == flag:
            skip = True
            continue
        out.append(a)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", required=True,
                    help="trainer save root (watched for run dirs/ckpts)")
    ap.add_argument("--stall_sec", type=int, default=600)
    ap.add_argument("--max_restarts", type=int, default=10)
    ap.add_argument("--out", default="/tmp/watchdog_trainer.out")
    ap.add_argument("--wait_for_device", action="store_true",
                    help="probe the device until it answers BEFORE every "
                         "launch (for starting during an outage)")
    ap.add_argument("--resume_flag", default="--resume",
                    help="trainer flag that takes the checkpoint on "
                         "relaunch (train_search: --resume; train_eval: "
                         "--snapshot)")
    ap.add_argument("--ckpt_glob", default="*/searched_model_*.pkl",
                    help="checkpoint pattern under --save to resume from "
                         "(train_eval: '*/checkpoint.pkl')")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- trainer command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("trainer command required after --")

    restarts = 0
    while True:
        if args.wait_for_device:
            while not probe_tpu():
                log("device probe failed; waiting before launch")
        run_cmd = list(cmd)
        ck = latest_ckpt(args.save, args.ckpt_glob)
        if restarts and ck:
            run_cmd = (strip_resume(run_cmd, args.resume_flag)
                       + [args.resume_flag, ck])
            log(f"resuming from {ck}")
        log("launch: " + " ".join(run_cmd))
        with open(args.out, "ab") as f:
            proc = subprocess.Popen(run_cmd, stdout=f, stderr=f,
                                    start_new_session=True)
        launched = time.time()
        while True:
            time.sleep(30)
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    log("trainer exited cleanly; watchdog done")
                    return
                log(f"trainer died rc={rc}")
                break
            lg = newest(os.path.join(args.save, "*", "log.txt"))
            ref = os.path.getmtime(lg) if lg else launched
            ref = max(ref, launched)
            if time.time() - ref > args.stall_sec:
                log(f"stall: no log progress for {args.stall_sec}s; killing")
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                break
        restarts += 1
        if restarts > args.max_restarts:
            log("max restarts exceeded; giving up")
            return
        log("waiting for the relay to answer a probe...")
        deadline = time.time() + 7200
        while time.time() < deadline:
            if probe_tpu():
                log("relay alive")
                break
            log("probe failed; retrying")
        else:
            log("relay never recovered; giving up")
            return


if __name__ == "__main__":
    main()
