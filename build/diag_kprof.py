import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from hexspark import kernels

rng = np.random.default_rng(1)
vocab = ["".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), rng.integers(3, 10))) for _ in range(2000)]
docs = [" ".join(rng.choice(vocab, rng.integers(200, 400))) for _ in range(1200)]
data = np.frombuffer("".join(docs).encode(), dtype=np.uint8)
offs = np.zeros(len(docs) + 1, dtype=np.int64)
np.cumsum([len(d.encode()) for d in docs], out=offs[1:])

def t(name, fn, reps=5):
    fn()
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn()
    print(f"{name}: {(time.monotonic()-t0)/reps*1000:.0f}ms")
    return out

h, bounds = t("hash_tokens_utf8", lambda: kernels.hash_tokens_utf8(data, offs))
print(f"tokens: {len(h)}")
t("simhash_full", lambda: kernels.simhash256_from_utf8(data, offs))

lanes = np.empty((len(h), 4), dtype=np.uint64)
for k in range(4):
    lanes[:, k] = kernels.splitmix64(h + np.uint64(k + 1))
t("lanes_only", lambda: kernels.splitmix64(h + np.uint64(1)))
t("unpackbits_part", lambda: np.unpackbits(lanes.view(np.uint8).ravel()).reshape(len(h), 256).reshape(-1, 8, 256).sum(axis=1, dtype=np.uint16) if len(h) % 8 == 0 else None, reps=3)
