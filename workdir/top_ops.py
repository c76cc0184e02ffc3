import sys, collections, re
sys.argv = ["x", "/tmp/xplane_raw.txt", "0"]
exec(open("/root/repo/workdir/agg_xplane.py").read().split("# category summary")[0])
flt = sys.argv[3] if len(sys.argv) > 3 else ""
items = []
for mid, v in tot.items():
    nm, long_nm = meta.get(mid, (f"id{mid}", ""))
    m = re.search(r"= \S+ (\w[\w-]*)\(", long_nm)
    op = m.group(1) if m else nm.split("(")[0].split(".")[0]
    items.append((v, cnt[mid], nm, op, long_nm))
items.sort(reverse=True)
import sys as s2
want = s2.argv[1] if len(s2.argv) > 1 else ""
