"""Device-timeline breakdown of a ``jax.profiler`` trace — no TensorBoard.

``main.py --profile_dir D`` (and ``jax.profiler.trace(D)`` generally) writes
``D/plugins/profile/<ts>/*.trace.json.gz`` next to the raw xplane protobuf.
The TensorBoard profile plugin is the usual way to read these, but its
protobuf bindings are brittle across environments; this tool reads the
Chrome-trace JSON directly and prints what perf work actually needs:

  * total device time per XLA module (= the cost of each jitted function),
  * top ops by device time with instance counts (scan bodies show up as
    n=steps), and
  * category aggregation (op name with trailing indices stripped), which
    separates matmul/conv fusions from copies/pads/reduces at a glance.

Wall-clock timing through a remote-dispatch relay misattributes fixed
per-execution costs to the model; the device timeline here is what the chip
itself spent (see CLAUDE.md benchmark-methodology note).

CLI:  python -m diffusiondepth_tpu.tools.analyze_trace /tmp/profdir [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
from typing import Dict, Optional, Tuple


def find_trace_file(path: str) -> str:
    """``path`` may be the profile root, a session dir, or the .json.gz
    itself; resolve to the newest trace file beneath it."""
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return max(hits, key=os.path.getmtime)


def load_device_events(trace_file: str):
    """Parse the Chrome trace; returns (device_name, lanes) where lanes maps
    lane-name -> list of (op_name, dur_us)."""
    with gzip.open(trace_file) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids: Dict[int, str] = {}
    tids: Dict[Tuple[int, Optional[int]], str] = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device = next(
        (n for n in pids.values() if "TPU" in n or "GPU" in n), None
    ) or next((n for n in pids.values() if "device" in n.lower()), None)
    lanes: Dict[str, list] = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        # no accelerator process (CPU-only trace): keep every lane, prefixed
        # by its process, so host XLA/TSL activity is still summarizable
        pname = pids.get(e["pid"], "")
        if device is not None and pname != device:
            continue
        lane = tids.get((e["pid"], e.get("tid")), str(e.get("tid")))
        if device is None:
            lane = f"{pname}:{lane}"
        lanes[lane].append((e["name"], float(e.get("dur", 0))))
    return device or "", lanes


_TRAILING_IDX = re.compile(r"[.\d]+$")


def summarize(trace_file: str, top: int = 40) -> str:
    device, lanes = load_device_events(trace_file)
    out = [f"trace: {trace_file}", f"device: {device or '<none found>'}"]

    mods = collections.Counter()
    for name, dur in lanes.get("XLA Modules", []):
        mods[name] += dur
    if mods:
        out.append("-- XLA modules (device ms) --")
        for k, v in mods.most_common(10):
            out.append(f"{v / 1000:10.2f} ms  {k}")

    ops = collections.Counter()
    cnt = collections.Counter()
    for name, dur in lanes.get("XLA Ops", []):
        ops[name] += dur
        cnt[name] += 1
    if ops:
        out.append(f"-- top {top} ops (device ms, n = instances) --")
        for k, v in ops.most_common(top):
            out.append(f"{v / 1000:10.2f} ms  n={cnt[k]:6d}  {k[:100]}")
        cats = collections.Counter()
        for k, v in ops.items():
            cats[_TRAILING_IDX.sub("", k)] += v
        out.append("-- categories --")
        for k, v in cats.most_common(25):
            out.append(f"{v / 1000:10.2f} ms  {k[:100]}")
    if not mods and not ops:
        out.append("(no device XLA lanes found — CPU-only traces put ops on "
                   "host threads; totals per lane:)")
        for lane, evs in sorted(lanes.items()):
            out.append(f"{sum(d for _, d in evs) / 1000:10.2f} ms  {lane}")
    return "\n".join(out)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", help="profile dir (or .trace.json.gz file)")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args(argv)
    print(summarize(find_trace_file(args.path), top=args.top))


if __name__ == "__main__":
    sys.exit(main())
