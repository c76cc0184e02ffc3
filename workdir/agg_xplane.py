"""Aggregate a protoc --decode_raw'd xplane: op time on the TPU plane.

Flat single-pass state machine (the dump is ~5M lines; nested
re-scanning is too slow on this 1-vCPU host).

Layout: XSpace.planes "1 {"; XPlane.name=2, lines "3 {",
event_metadata "4 {" (1=id, 2=long, 4=short); XLine events "4 {"
(1=metadata_id, 3=duration_ps).
"""
import sys, collections

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xplane_raw.txt"
topk = int(sys.argv[2]) if len(sys.argv) > 2 else 45

meta = {}
tot = collections.Counter()
cnt = collections.Counter()

depth = 0
in_tpu = False          # inside the /device:TPU:0 plane
plane_depth_at = 1
ctx = []                # stack of block tags ("plane","md","line","ev",...)
cur_mid = None
cur_long = None
cur_short = None
ev_mid = None
ev_dur = 0
expect_plane_name = False

with open(path) as f:
    for ln in f:
        s = ln.strip()
        if s.endswith("{"):
            tag = s.split()[0]
            if depth == 0 and tag == "1":
                ctx.append("plane")
                expect_plane_name = True
            elif in_tpu and depth == 1 and tag == "4":
                ctx.append("md")
                cur_mid = cur_long = cur_short = None
            elif in_tpu and depth == 1 and tag == "3":
                ctx.append("line")
            elif in_tpu and depth == 2 and ctx and ctx[-1] == "line" and tag == "4":
                ctx.append("ev")
                ev_mid = None
                ev_dur = 0
            elif in_tpu and depth == 2 and ctx and ctx[-1] == "md" and tag == "2":
                ctx.append("mdv")   # map value: XEventMetadata
            else:
                ctx.append("x")
            depth += 1
            continue
        if s == "}":
            depth -= 1
            top = ctx.pop() if ctx else "x"
            if top == "plane":
                in_tpu = False
            elif top == "md" and cur_mid is not None:
                meta[cur_mid] = (cur_short or cur_long or f"id{cur_mid}",
                                 cur_long or "")
            elif top == "ev" and ev_mid is not None:
                tot[ev_mid] += ev_dur
                cnt[ev_mid] += 1
            continue
        # leaf fields
        if expect_plane_name and depth == 1 and s.startswith('2: "'):
            in_tpu = s == '2: "/device:TPU:0"'
            expect_plane_name = False
            continue
        if not in_tpu or not ctx:
            continue
        top = ctx[-1]
        if top == "md" and depth == 2:
            if s.startswith("1: ") and cur_mid is None:
                try:
                    cur_mid = int(s[3:])
                except ValueError:
                    pass
        elif top == "mdv" and depth == 3:
            if s.startswith('2: "') and cur_long is None:
                cur_long = s[4:-1]
            elif s.startswith('4: "') and cur_short is None:
                cur_short = s[4:-1]
        elif top == "ev" and depth == 3:
            if s.startswith("1: ") and ev_mid is None:
                try:
                    ev_mid = int(s[3:])
                except ValueError:
                    pass
            elif s.startswith("3: "):
                try:
                    ev_dur = int(s[3:])
                except ValueError:
                    pass

total = sum(tot.values())
print(f"TPU plane total: {total/1e12:.4f} s device time, "
      f"{sum(cnt.values())} events")
for mid, v in tot.most_common(topk):
    nm, long_nm = meta.get(mid, (f"id{mid}", ""))
    print(f"{v/1e9:10.3f} ms  x{cnt[mid]:<6d} {nm:30s} {long_nm[:90]}")

# category summary: opcode = token after '= ' and before '('
import re as _re
cats = collections.Counter()
for mid, v in tot.items():
    nm, long_nm = meta.get(mid, (f"id{mid}", ""))
    m = _re.search(r"= \S+ (\w[\w-]*)\(", long_nm)
    op = m.group(1) if m else nm.split("(")[0].split(".")[0]
    cats[op] += v
print("\n-- by opcode --")
for op, v in cats.most_common(25):
    print(f"{v/1e9:10.3f} ms  {op}")
