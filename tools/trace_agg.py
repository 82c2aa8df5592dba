"""Aggregate device-track op durations from a jax.profiler trace.json.gz."""
import gzip, json, sys, glob, collections, re

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tscprof"
paths = sorted(glob.glob(d + "/plugins/profile/*/*.trace.json.gz"))
assert paths, f"no trace under {d}"
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)
ev = data["traceEvents"]

# find device (TPU) process ids
pids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"]["name"]
dev_pids = {p for p, n in pids.items() if "TPU" in n or "tpu" in n or "/device" in n.lower()}
if not dev_pids:
    print("process names:", pids)
    dev_pids = set(pids)

tot = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e["name"]
        dur = e.get("dur", 0) / 1e3  # ms
        # strip fusion numbering
        base = re.sub(r"\.\d+$", "", name)
        tot[base] += dur
        cnt[base] += 1
        total += dur

print(f"total device time: {total:.1f} ms over {sum(cnt.values())} ops")
for name, ms in tot.most_common(40):
    print(f"{ms:9.2f} ms  x{cnt[name]:<5} {name[:110]}")
