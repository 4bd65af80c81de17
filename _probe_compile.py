import time, sys
t0=time.time()
import jax, jax.numpy as jnp, numpy as np, dataclasses
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
log("imports jax")
from focalformer3d_tpu.configs import get_config
from focalformer3d_tpu.data import synthetic
from focalformer3d_tpu.models.detector import FocalFormer3D, preprocess_points, with_compute_dtype
from focalformer3d_tpu.models import focal_decoder as fd
log("imports pkg")
cfg = get_config("FocalFormer3D_L")["model"]
cfg = with_compute_dtype(cfg, "bfloat16")
model = FocalFormer3D(cfg)
rng = np.random.RandomState(0)
batch = synthetic.make_batch(rng, batch_size=1, n_points=200000, n_boxes=24, max_gts=32,
    num_classes=cfg.decoder.num_classes, pc_range=cfg.voxel.point_cloud_range, mode="radial")
points = jnp.asarray(batch["points"]); mask = jnp.asarray(batch["points_mask"])
log("data ready")
pp = jax.jit(lambda p,m: preprocess_points(cfg, p, m))
vox0 = pp(points, mask)
jax.block_until_ready(vox0["features"])
log("preprocess compiled+ran")
init = jax.jit(lambda k, v: model.init({"params": k}, v, None, False))
variables = init(jax.random.PRNGKey(0), vox0)
jax.block_until_ready(jax.tree.leaves(variables)[0])
log("init compiled+ran")
@jax.jit
def infer(variables, points, mask, eps):
    vox = preprocess_points(cfg, points + eps, mask)
    out = model.apply(variables, vox, None, False)
    dec = fd.get_bboxes(cfg.decoder, out, 200)
    return dec, dec["scores"].sum() * 0.0
res, eps = infer(variables, points, mask, jnp.float32(0))
_ = float(eps)
log("infer compiled+ran")
res, eps = infer(variables, points, mask, eps)
_ = float(eps)
log("second run")
n=10; t1=time.time()
for i in range(n): res, last = infer(variables, points, mask, eps)
_ = float(last)
log(f"{n} iters: {(time.time()-t1)/n*1e3:.1f} ms/scan")
