#!/usr/bin/env python3
"""Wrap a command with /proc/diskstats + /proc/stat sampling (r9,
VERDICT r8 item 8: make the d2/d15 sf100 page-cache->disk residual a
measured fact, not an inference).

Usage: io_probe.py <outfile.json> -- <cmd...>
Samples every 2 s: cumulative sectors read/written on the root device
and the machine-wide cpu busy/iowait jiffies; prints per-phase deltas
(quartiles of wall time) so "read-IO dominance in the tail" is visible
directly.
"""
import json, os, subprocess, sys, time

out_path = sys.argv[1]
assert sys.argv[2] == "--"
cmd = sys.argv[3:]


def pick_device():
    """IOPROBE_DEV env var, else the busiest whole-disk device by
    cumulative sectors written (r10, per advisor: 'vda' was hardcoded
    and raised immediately on nvme/sda hosts)."""
    env = os.environ.get("IOPROBE_DEV")
    if env:
        return env
    best, best_wr = None, -1
    # whole disks (not partitions) appear as directories directly under
    # /sys/block — name heuristics misclassify digit-suffixed whole
    # disks like mmcblk0/nvme0n1 (r11, per advisor), membership doesn't
    whole = set(os.listdir("/sys/block")) if os.path.isdir("/sys/block") else None
    for line in open("/proc/diskstats"):
        f = line.split()
        name = f[2]
        # skip virtual devices, then partitions
        if name.startswith(("loop", "ram", "dm-", "md", "zram")):
            continue
        if whole is not None:
            if name not in whole:
                continue
        else:  # /sys/block absent: fall back to the old name heuristic
            if name[-1].isdigit() and not name.startswith(("nvme", "mmcblk")):
                continue
            if name.startswith("nvme") and "p" in name.split("n", 2)[-1]:
                continue
            if name.startswith("mmcblk") and "p" in name[6:]:
                continue
        wr = int(f[9])
        if wr > best_wr:
            best, best_wr = name, wr
    if best is None:
        raise RuntimeError("no block device found in /proc/diskstats "
                           "(set IOPROBE_DEV)")
    return best


DEV = pick_device()


def disk():
    for line in open("/proc/diskstats"):
        f = line.split()
        if f[2] == DEV:
            # sectors read = f[5], ms reading = f[6]; sectors written = f[9]
            return {"rd_mb": int(f[5]) * 512 / 1048576.0,
                    "rd_ms": int(f[6]),
                    "wr_mb": int(f[9]) * 512 / 1048576.0}
    raise RuntimeError(f"device {DEV} not in /proc/diskstats")


def cpu():
    f = open("/proc/stat").readline().split()
    user, nice, system, idle, iowait = (int(x) for x in f[1:6])
    return {"busy": user + nice + system, "idle": idle, "iowait": iowait}


samples = []
t0 = time.time()
proc = subprocess.Popen(cmd)
while proc.poll() is None:
    samples.append({"t": time.time() - t0, "disk": disk(), "cpu": cpu()})
    time.sleep(2)
samples.append({"t": time.time() - t0, "disk": disk(), "cpu": cpu()})
rc = proc.returncode
wall = samples[-1]["t"]

# per-quartile deltas of the run's wall time
quarters = []
for q in range(4):
    lo, hi = wall * q / 4, wall * (q + 1) / 4
    win = [s for s in samples if lo <= s["t"] <= hi]
    if len(win) < 2:
        continue
    a, b = win[0], win[-1]
    dt = max(b["t"] - a["t"], 1e-9)
    dbusy = b["cpu"]["busy"] - a["cpu"]["busy"]
    diow = b["cpu"]["iowait"] - a["cpu"]["iowait"]
    didle = b["cpu"]["idle"] - a["cpu"]["idle"]
    quarters.append({
        "quarter": q + 1,
        "sec": round(dt, 1),
        "read_mb": round(b["disk"]["rd_mb"] - a["disk"]["rd_mb"], 1),
        "read_mb_s": round((b["disk"]["rd_mb"] - a["disk"]["rd_mb"]) / dt, 1),
        "write_mb": round(b["disk"]["wr_mb"] - a["disk"]["wr_mb"], 1),
        "cpu_busy_pct": round(100.0 * dbusy / max(dbusy + diow + didle, 1), 1),
        "iowait_pct": round(100.0 * diow / max(dbusy + diow + didle, 1), 1),
    })

result = {
    "cmd": " ".join(cmd), "rc": rc, "wall_sec": round(wall, 1),
    "total_read_mb": round(samples[-1]["disk"]["rd_mb"] - samples[0]["disk"]["rd_mb"], 1),
    "total_write_mb": round(samples[-1]["disk"]["wr_mb"] - samples[0]["disk"]["wr_mb"], 1),
    "quarters": quarters,
}
json.dump(result, open(out_path, "w"), indent=1)
print(json.dumps(result))
sys.exit(rc)
