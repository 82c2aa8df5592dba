"""Training-run stall watchdog (SURVEY §5 failure detection / restart).

Long campaigns over a remote-attached accelerator can wedge on a stalled
tunnel transfer (observed round 4: a full-state device pull hung in futex
wait for 17+ minutes mid-campaign with zero IO).  The reference's answer
to failures is restart-from-last-checkpoint (README + save_interval); this
makes that loop automatic: watch the training log for progress, and when
it stalls past the threshold, kill the exact PID and relaunch a resume
command that restores from the newest exact-resume state.

  python tools/watchdog.py --log logs/bbc_r4_train.log --pid-of train_bbc \
      --stall-sec 600 --max-restarts 5 -- <resume command...>

The resume command runs with the same stdout log (appended).  The watchdog
exits when the watched process exits cleanly (rc=0) or restarts are
exhausted.
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def newest_line_age(path):
    try:
        return time.time() - os.stat(path).st_mtime
    except OSError:
        return 0.0


def find_pid(marker):
    out = subprocess.run(["ps", "ax", "-o", "pid=,args="],
                         capture_output=True, text=True).stdout
    for line in out.splitlines():
        pid, _, args = line.strip().partition(" ")
        if marker in args and "watchdog" not in args:
            return int(pid)
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True)
    p.add_argument("--pid-of", required=True,
                   help="substring identifying the watched process cmdline")
    p.add_argument("--stall-sec", type=float, default=600.0)
    p.add_argument("--poll-sec", type=float, default=30.0)
    p.add_argument("--max-restarts", type=int, default=5)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="resume command (after --)")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd

    restarts = 0
    while True:
        time.sleep(args.poll_sec)
        pid = find_pid(args.pid_of)
        age = newest_line_age(args.log)
        if pid is None:
            print(f"[watchdog] watched process gone (log idle {age:.0f}s); "
                  "exiting", flush=True)
            return
        if age < args.stall_sec:
            continue
        print(f"[watchdog] stall: log idle {age:.0f}s > {args.stall_sec:.0f}s; "
              f"killing pid {pid}", flush=True)
        # kill the PROCESS GROUP: a setsid/nohup launch makes the shell
        # wrapper the group leader, and killing only the matched pid can
        # orphan the actual python trainer still wedged on the device
        # (observed r5: the bash wrapper died, the trainer kept the tunnel)
        try:
            pgid = os.getpgid(pid)
            os.killpg(pgid, signal.SIGTERM)
            time.sleep(10)
            os.killpg(pgid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        except PermissionError:
            try:
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        time.sleep(5)
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] restart budget exhausted", flush=True)
            sys.exit(1)
        if not cmd:
            print("[watchdog] no resume command; exiting", flush=True)
            sys.exit(1)
        with open(args.log, "ab") as logf:
            logf.write(b"\n[watchdog] restarting\n")
            # own session: the group-kill above must never reach the
            # watchdog's own process group
            subprocess.Popen(cmd, stdout=logf, stderr=logf,
                             start_new_session=True)
        print(f"[watchdog] restarted ({restarts}/{args.max_restarts})",
              flush=True)


if __name__ == "__main__":
    main()
