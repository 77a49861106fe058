"""No-Ray scaling control: the scorer's per-span work in K plain processes.

The in-sandbox scaling evidence (bench.py --scaling) runs one job at two
`ray.init(num_cpus=N)` levels on ONE physical box.  Real N- vs 4N-node
clusters bring independent DRAM per node; this box shares one memory bus,
so per-core throughput decays as more cores go busy — a hardware artifact
that would NOT transfer to the cluster the protocol stands in for.  This
control measures that decay with zero orchestration: K `multiprocessing`
workers each run the identical per-span OCR work (decode → segment →
features → classify) on an interleaved slice of the SAME ref population
(refs[i::K], so every level sees the same page-size mix), state built
outside the timed window.  pages/s/core at K=1,2,4,8 busy cores bounds
how much of the measured Ray efficiency loss is the box, not the engine.

Usage: python tools/scaling_control.py [--pages-per-proc 1200]
Writes one JSON line; the current reading is recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _worker(refs: list[str], media_root: str, q) -> None:
    from tensorflow_ocr_ray.stages.ocr_stages import OcrSpanStage

    st = OcrSpanStage(media_spec={"kind": "dir", "path": media_root})
    # warm one page so imports/allocator setup stay out of the window
    st._ocr_ref(refs[0])
    t0 = time.time()
    for r in refs:
        st._ocr_ref(r)
    q.put((len(refs), time.time() - t0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-per-proc", type=int, default=1200)
    ap.add_argument("--docs", type=int, default=24000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import os

    from tensorflow_ocr_ray.fixtures import generate_documents, payload_for_ref
    from tensorflow_ocr_ray.state.media import DirMediaStore

    docs = generate_documents(args.docs, seed=args.seed)
    refs = sorted({s["media_ref"] for r in docs.to_pylist()
                   for s in r["spans"] if s["kind"] == "media"})
    media_root = f"/tmp/graft_media_s{args.seed}_n{args.docs}"
    if not os.path.exists(os.path.join(media_root, "_COMPLETE")):
        os.makedirs(media_root, exist_ok=True)
        for ref in refs:
            DirMediaStore.put(media_root, ref, payload_for_ref(ref))
        with open(os.path.join(media_root, "_COMPLETE"), "w") as f:
            f.write(str(len(refs)))

    out = {}
    for k in (1, 2, 4, 8):
        # interleaved assignment: every proc sees the same page-size mix
        per = min(args.pages_per_proc, len(refs) // k)
        slices = [refs[i::k][:per] for i in range(k)]
        q = mp.Queue()
        procs = [mp.Process(target=_worker, args=(s, media_root, q))
                 for s in slices]
        for p in procs:
            p.start()
        res = [q.get() for _ in procs]
        for p in procs:
            p.join()
        wall = max(t for _, t in res)
        out[f"procs_{k}"] = round(per / wall, 1)
    print(json.dumps({"metric": "pages/s/core (no-Ray control)",
                      "levels": out}))


if __name__ == "__main__":
    main()
