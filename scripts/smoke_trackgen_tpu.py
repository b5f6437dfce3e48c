"""Complete two-stage pipeline on real TPU with real models (random weights):
AMG proposals -> prompts JSON -> SAM2 video tracking -> sam2_tracks artifacts
-> AlignDataset -> selection forward."""
import json, os, tempfile, time
import numpy as np

root = tempfile.mkdtemp(prefix="sola_full_")
print("workspace:", root, flush=True)

# --- synthetic video ---
T, H, W = 12, 480, 854
frames = []
for i in range(T):
    f = np.zeros((H, W, 3), np.uint8)
    f[100:220, 100 + 8 * i:260 + 8 * i] = (200, 80, 40)
    f[300:420, 500:640] = (40, 200, 120)
    frames.append(f)

# --- stage 1a: real AMG (permissive thresholds for random weights) ---
from sola_tpu.utils import compcache
compcache.enable()

from sola_tpu.trackgen.sam2.amg import SAM2AutomaticMaskGenerator
from sola_tpu.trackgen.sam2.convert import build_sam2
from sola_tpu.trackgen.sam2.image import SAM2ImagePredictor
from sola_tpu.trackgen.sam2.video import SAM2VideoPredictor
from sola_tpu.trackgen.prompts_grid import generate_video_prompts

model, variables = build_sam2(None)
amg = SAM2AutomaticMaskGenerator(
    SAM2ImagePredictor(model, variables), points_per_side=8,
    points_per_batch=64, pred_iou_thresh=-1e9, stability_score_thresh=-1.0)
t0 = time.time()
prompt_info = generate_video_prompts(amg, frames, None, "vid0", bin_size=6)
print(f"AMG prompts: {len(prompt_info['prompt_masks'])} in {time.time()-t0:.1f}s",
      flush=True)
prompt_dir = os.path.join(root, "sam2_prompts/grid_prompts/mevis/valid_u")
os.makedirs(prompt_dir)
with open(os.path.join(prompt_dir, "vid0.json"), "w") as f:
    json.dump(prompt_info, f)

# --- stage 1b: real SAM2 video tracking ---
from sola_tpu.trackgen.tokens_grid import run_video
pred = SAM2VideoPredictor(model, variables, obj_batch=2, scan_chunk=8)
t0 = time.time()
state = pred.init_state(frames)
print(f"init_state: {time.time()-t0:.1f}s", flush=True)
out_dir = os.path.join(root, "sam2_tracks/grid_tracks/mevis/valid_u")
t0 = time.time()
census = run_video(pred, "vid0", None, os.path.join(prompt_dir, "vid0.json"),
                   out_dir, "mevis", "valid_u", bin_size=6, batch_size=2,
                   n_max_tracks=2, state=state, log=lambda s: None)
print(f"tracking: {time.time()-t0:.1f}s census: tracked={census['n_tracked']} "
      f"filtered={census['n_filtered']}", flush=True)

# --- stage 2: selection consumes the artifacts ---
split = os.path.join(root, "datasets/mevis/valid_u")
os.makedirs(split)
meta = {"videos": {"vid0": {"frames": [f"{i:05d}" for i in range(T)],
        "expressions": {"0": {"exp": "the moving box", "anno_id": [0]}}}}}
from sola_tpu.core import rle as rle_lib
gt = np.zeros((T, H, W), np.uint8)
for i in range(T):
    gt[i, 100:220, 100 + 8 * i:260 + 8 * i] = 1
mask_dict = {"0": [rle_lib.encode(m) for m in gt]}
with open(os.path.join(split, "meta_expressions.json"), "w") as f:
    json.dump(meta, f)
with open(os.path.join(split, "mask_dict.json"), "w") as f:
    json.dump(mask_dict, f)

from sola_tpu.data.dataset import AlignDataset
ds = AlignDataset({"data_name": "mevis", "data_type": "valid_u",
                   "data_root": os.path.join(root, "datasets"),
                   "track_root": os.path.join(root, "sam2_tracks"),
                   "sam2_output_dirs": "grid_tracks"})
s = ds.get_sample(0)
print("tokens:", s["object_tokens"].shape, "finite:",
      bool(np.isfinite(s["object_tokens"]).all()), flush=True)

import jax, jax.numpy as jnp
from sola_tpu.models.selection import SelectionConfig, SelectionModel
sel = SelectionModel(SelectionConfig())
obj = jnp.asarray(s["object_tokens"])[None]
lang = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 1024))
sel_vars = sel.init(jax.random.PRNGKey(0), obj, lang)
score, _ = sel.apply(sel_vars, obj, lang)
print("selection scores:", np.asarray(score), flush=True)
print("FULL PIPELINE ON TPU OK", flush=True)
