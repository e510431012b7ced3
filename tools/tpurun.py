#!/usr/bin/env python
"""Run a TPU script with stall detection and retry.

The axon relay occasionally hangs at chip acquisition (the grant/claim
handshake); a fresh process usually succeeds.  This wrapper launches the
command, watches its stdout for progress, kills ITS OWN child (exact pid)
on stall, and retries.

usage: python tools/tpurun.py [--stall S] [--attempts N] [--total T] -- cmd...
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall", type=float, default=150.0,
                    help="kill if no output for this many seconds")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--total", type=float, default=540.0,
                    help="per-attempt wall-clock limit")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        sys.exit("no command given")

    for attempt in range(1, args.attempts + 1):
        print(f"[tpurun] attempt {attempt}: {' '.join(cmd)}",
              file=sys.stderr, flush=True)
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT,
                                preexec_fn=os.setsid)
        last = time.time()
        start = last
        stalled = False
        os.set_blocking(proc.stdout.fileno(), False)
        while True:
            chunk = proc.stdout.read()
            if chunk:
                sys.stdout.write(chunk.decode(errors="replace"))
                sys.stdout.flush()
                last = time.time()
            if proc.poll() is not None:
                rest = proc.stdout.read()
                if rest:
                    sys.stdout.write(rest.decode(errors="replace"))
                break
            now = time.time()
            if now - last > args.stall or now - start > args.total:
                stalled = True
                print(f"[tpurun] stall/timeout after {now-start:.0f}s, "
                      f"killing pgid {proc.pid}", file=sys.stderr, flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                break
            time.sleep(1.0)
        if not stalled and proc.returncode == 0:
            sys.exit(0)
        time.sleep(5.0)
    sys.exit(1)


if __name__ == "__main__":
    main()
