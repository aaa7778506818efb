import multiprocessing as mp, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def work(n_iters):
    os.sched_setaffinity(0, range(32))
    from tilers_tools_ray import codecs, raster
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (128, 128, 4)).astype(np.uint8)
    px[:, :, 3] = 255
    gt = np.array([1e6, 500.0, 0.0, 2e6, 0.0, -500.0])
    t0 = time.time()
    for _ in range(n_iters):
        raster.warp_image_to_base(px, gt, "EPSG:3857", None, 9)
    return time.time() - t0

def run(nproc, iters=60):
    t0 = time.time()
    with mp.Pool(nproc) as p:
        p.map(work, [iters] * nproc)
    wall = time.time() - t0
    return nproc * iters / wall

if __name__ == "__main__":
    for nproc in (1, 8, 32):
        tput = run(nproc)
        print(f"nproc={nproc}: {tput:.1f} warps/s")
