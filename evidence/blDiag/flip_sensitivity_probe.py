import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, dataclasses
from awm_tpu import checkpoint as ck, train as tr
from awm_tpu.config import get_config, ModelConfig
from awm_tpu.api import InferenceSession
from awm_tpu.data import SyntheticClips, split_indices

cfg = get_config("base")
arch = ck.read_arch("runs/blR2/ckpt_best")
known = {f.name for f in dataclasses.fields(ModelConfig)}
arch = {k: v for k, v in arch.items() if k in known}
if "strides" in arch: arch["strides"] = tuple(arch["strides"])
cfg = dataclasses.replace(cfg, model=ModelConfig(**arch))
state, gen, det = tr.init_state(cfg, jax.random.key(0))
state, _, _ = ck.restore_params("runs/blR2/ckpt_best", state)
sess = InferenceSession.from_state(cfg, gen, det, state)

ds = SyntheticClips(n=24576, audio_len=cfg.audio_len)
_, _, te = split_indices(len(ds), (0.8, 0.1, 0.1), seed=cfg.train.seed)
s = np.stack([ds[i] for i in te[:16]])  # (16, T)

# one batched call: 17 messages x 16 clips = 272 chunks
msgs, reps = [np.zeros(16, dtype=np.int32)], [s]
for b in range(16):
    msgs.append(np.full(16, 1 << b, dtype=np.int32))
    reps.append(s)
allm = np.concatenate(msgs)
alls = np.concatenate(reps)
wm = sess.embed_chunks(alls, allm).reshape(17, 16, -1)
d0 = wm[0] - s
print("base delta rms:", round(float(np.sqrt((d0**2).mean())), 5))
for b in range(16):
    diff = wm[b + 1] - wm[0]
    print(f"bit {b:2d} flip-delta rms: {float(np.sqrt((diff**2).mean())):.5f}")
