import time, numpy as np, jax, jax.numpy as jnp
from encodec_tpu.train.config import load_config
from encodec_tpu.train.trainer import model_from_config
from encodec_tpu.train.checkpoint import load_checkpoint
from encodec_tpu.train.steps import TrainState
from encodec_tpu.data import BreathingDataset
from encodec_tpu.tools.inference import extract_codes

t0=time.time()
config = load_config("/tmp/converge10x/config.yaml")
model = model_from_config(config)
raw, epoch, _ = load_checkpoint("/tmp/converge10x/model.ckpt")
state = TrainState(*raw)
model.params = jax.tree.map(jnp.asarray, state.params)
model.qstate = jax.tree.map(jnp.asarray, state.qstate)
print("model ready", time.time()-t0, flush=True)

ds = BreathingDataset("/tmp/synth_breathing", "synth", mode="test",
                      channels={"thorax": 1.0})
print("dataset len", len(ds), time.time()-t0, flush=True)
t1=time.time()
item = ds[0]
print("item0 loaded", item["x"].shape, time.time()-t1, flush=True)
t1=time.time()
codes = extract_codes(model, item["x"])
print("codes", codes.shape, time.time()-t1, flush=True)
t1=time.time()
item = ds[1]
codes = extract_codes(model, item["x"])
print("item1", codes.shape, time.time()-t1, flush=True)
