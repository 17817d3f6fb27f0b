"""Compare x-profiles: reference LAMMPS ave/chunk output vs our npz."""
import sys

import numpy as np


def load_ref(path, skip_until=10000):
    lines = open(path).read().splitlines()
    windows = []
    i = 0
    while i < len(lines):
        l = lines[i]
        if l.startswith("#"):
            i += 1
            continue
        t = l.split()
        if len(t) == 3:
            step, nch = int(t[0]), int(t[1])
            rows = []
            for _ in range(nch):
                i += 1
                rows.append([float(v) for v in lines[i].split()])
            windows.append((step, np.asarray(rows)))
        i += 1
    sel = [w for s, w in windows if s > skip_until]
    return np.mean(sel, axis=0)


def main(ref_path, ours_path):
    ref = load_ref(ref_path)
    ours = np.load(ours_path)
    dr, do = ref[:, 3], ours["density"]
    vr, vo = ref[:, 4], ours["vx"]
    tr, to = ref[:, 5], ours["temp"]

    def rmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    print(f"density: ref mean {dr.mean():.4f} ours {do.mean():.4f} "
          f"RMSE/mean {rmse(dr, do) / dr.mean() * 100:.2f}%")
    print(f"vx     : RMSE {rmse(vr, vo):.4f}")
    print(f"temp   : ref mean {tr.mean():.4f} ours {to.mean():.4f} "
          f"RMSE/mean {rmse(tr, to) / tr.mean() * 100:.2f}%")
    # bulk-only temp (exclude near-empty edge bins)
    mask = dr > 0.5
    print(f"temp (bulk bins): RMSE/mean "
          f"{rmse(tr[mask], to[mask]) / tr[mask].mean() * 100:.2f}%")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
