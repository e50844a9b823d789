import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from hexspark import kernels

# synthesize ~36k docs of ~2KB each like the fixture convs
rng = np.random.default_rng(1)
docs = []
vocab = ["".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), rng.integers(3, 10))) for _ in range(2000)]
for i in range(1200):
    n = rng.integers(200, 400)
    docs.append(" ".join(rng.choice(vocab, n)))
data = "".join(docs).encode()
offs = np.zeros(len(docs) + 1, dtype=np.int64)
np.cumsum([len(d.encode()) for d in docs], out=offs[1:])
data = np.frombuffer(data, dtype=np.uint8)

t0 = time.monotonic()
for _ in range(3):
    sig = kernels.simhash256_from_utf8(data, offs)
dt = (time.monotonic() - t0) / 3
print(f"{len(docs)} docs {len(data)/1e6:.1f}MB: {dt*1000:.0f}ms/pass = {len(data)/dt/1e6:.0f}MB/s {len(docs)/dt:.0f} docs/s")
