"""ImageList dataset + threaded prefetching loader.

Reference parity: dataset/dataset.py (ImageList, default_list_reader,
pil_loader) and the DataLoader usage in the drivers. List files are the same
'relpath label' text format; the in-repo ImageNet-100 split lists of the
reference are consumed as-is.

TPU-native differences: batches are NHWC float32 (or bf16) numpy arrays,
assembled by a thread pool (PIL decode releases the GIL) and double-buffered
onto the device by `DevicePrefetcher`. With `host_shard=(i, n)` the list is
sharded per host — the DistributedSampler equivalent
(train_eval_amp.py:220-222).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading

import numpy as np

from ..runtime import native
from .transforms import (IMAGENET_MEAN, IMAGENET_STD, quantize_u8,
                         sample_jitter, sample_rrc_box, train_transform,
                         train_transform_u8, val_transform,
                         val_transform_u8)

_ZERO3 = np.zeros((3,), np.float32)
_ONE3 = np.ones((3,), np.float32)


def default_list_reader(list_path):
    """'relpath label' lines (dataset/dataset.py:22-29)."""
    img_list = []
    if not os.path.exists(list_path):
        raise FileNotFoundError(
            f"image list '{list_path}' not found. The reference ships its "
            "ImageNet-100 split lists in-repo; this repo regenerates them "
            "instead: run `python dataset/make_lists.py --imagenet_root "
            "<path>` for ImageNet-100, or `python dataset/make_proxy_dataset"
            ".py --out_root <path>` for the self-contained real-JPEG proxy "
            "set, or pass --synthetic for a dataless smoke run.")
    with open(list_path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            img_path, label = line.split(" ")
            img_list.append((img_path, int(label)))
    return img_list


def pil_loader(path):
    from PIL import Image
    with Image.open(path) as img:
        return img.convert("RGB").copy()


def jpeg_size(data):
    """(width, height) from a JPEG byte buffer, pure Python (SOF marker
    scan). Used on the batch path so dimension probing never releases the
    GIL — a ctypes call per image from loader threads pays up to a full
    GIL switch interval (~5 ms) on reacquire when another thread runs
    Python. Raises ValueError for non-JPEG data."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG")
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = (data[i + 2] << 8) | data[i + 3]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry the frame dims
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = (data[i + 5] << 8) | data[i + 6]
            w = (data[i + 7] << 8) | data[i + 8]
            return w, h
        i += 2 + seg_len
    raise ValueError("no SOF marker found")


class ImageList:
    """Map-style dataset (dataset/dataset.py:32-49)."""

    def __init__(self, root, list_path, training, image_size=224,
                 list_reader=default_list_reader, loader=pil_loader,
                 host_shard=None, use_native="auto", output="float32",
                 rrc_scale=(0.08, 1.0)):
        """output: 'float32' = normalized float batches (classic);
        'uint8' = raw augmented uint8 pixels, normalized ON DEVICE by
        transforms.device_normalizer — 4x less host->device traffic, which
        is the search-step bottleneck on a tunneled device link.

        rrc_scale: RandomResizedCrop area range. (0.08, 1.0) is the
        reference's ImageNet setting (train_search.py:124-141); the
        compositional proxy task needs a gentler floor (~0.35) because an
        8%-area crop can land entirely in the distractor-textured ground
        region, destroying the (figure-texture, structure) label — measured
        in tools_proxy_learnability.py. Host-side only: the box is sampled
        in Python and shipped to the C++ decode either way."""
        self.root = root
        self.img_list = list_reader(list_path)
        if host_shard is not None and host_shard[1] > 1:
            # DistributedSampler parity (train_eval_amp.py:220-222): pad the
            # list to a multiple of the host count by wrapping, so every
            # host sees the SAME number of samples — equal per-host batch
            # counts keep multi-host collectives in lockstep.
            i, n = host_shard
            total = -(-len(self.img_list) // n) * n
            padded = self.img_list + self.img_list[:total - len(self.img_list)]
            self.img_list = padded[i::n]
        self.training = training
        self.image_size = image_size
        self.loader = loader
        self.use_native = (native.available() if use_native == "auto"
                           else bool(use_native))
        if output not in ("float32", "uint8"):
            raise ValueError(f"output must be float32|uint8, got {output}")
        self.output = output
        self.rrc_scale = tuple(rrc_scale)

    def __len__(self):
        return len(self.img_list)

    def _get_native(self, path, rng):
        """C++ decode + fused augment hot path (runtime/src/
        image_pipeline.cpp). Raises ValueError for non-JPEG inputs."""
        with open(path, "rb") as f:
            data = f.read()
        u8 = self.output == "uint8"
        # uint8 mode reuses the float entries with identity mean/std (the
        # single-image path is the PIL-fallback/slow path; the batch path
        # has dedicated u8 C entries)
        mean = _ZERO3 if u8 else IMAGENET_MEAN
        std = _ONE3 if u8 else IMAGENET_STD
        if self.training:
            w, h = native.image_size(data)
            box = sample_rrc_box(w, h, rng, self.rrc_scale)
            flip = rng.random() < 0.5
            order, factors = sample_jitter(rng)
            x = native.decode_augment_train(
                data, box, self.image_size, flip, order, factors, mean, std)
        else:
            img = native.decode_jpeg(data)
            x = native.augment_val(img, 256, self.image_size, mean, std)
        return quantize_u8(x) if u8 else x

    def get(self, index, rng):
        img_path, target = self.img_list[index]
        path = os.path.join(self.root, img_path)
        if self.use_native:
            try:
                return self._get_native(path, rng), target
            except ValueError:
                pass  # non-JPEG / corrupt: fall back to PIL below
        img = self.loader(path)
        if self.training:
            x = (train_transform_u8(img, rng, self.image_size,
                                    self.rrc_scale)
                 if self.output == "uint8"
                 else train_transform(img, rng, self.image_size,
                                      self.rrc_scale))
        else:
            x = (val_transform_u8(img, crop=self.image_size)
                 if self.output == "uint8"
                 else val_transform(img, crop=self.image_size))
        return x, target

    def get_batch(self, indices, rng):
        """Whole-batch native load: all file reads + rng sampling in Python
        (same per-image rng call sequence as get(), so shuffling/augment
        draws are identical), then ONE C call decodes + augments the batch
        (native.decode_augment_*_batch — one GIL round trip per batch
        instead of ~6 per image, which otherwise serializes loader threads
        via the GIL convoy effect). Returns (xs [n,S,S,3] f32, ys [n] i32).

        Non-JPEG/corrupt entries fall back to PIL decode + the same native
        augment with the already-sampled parameters."""
        n = len(indices)
        ys = np.empty((n,), np.int32)
        datas, boxes, flips, orders, factors = [], [], [], [], []
        pil_imgs = {}
        for j, index in enumerate(indices):
            img_path, ys[j] = self.img_list[index]
            path = os.path.join(self.root, img_path)
            with open(path, "rb") as f:
                datas.append(f.read())
            if self.training:
                try:
                    w, h = jpeg_size(datas[-1])
                except ValueError:
                    pil_imgs[j] = self.loader(path)
                    w, h = pil_imgs[j].size
                boxes.append(sample_rrc_box(w, h, rng, self.rrc_scale))
                flips.append(rng.random() < 0.5)
                order, facs = sample_jitter(rng)
                orders.append(order)
                factors.append(facs)
        u8 = self.output == "uint8"
        if self.training:
            if u8:
                xs, status = native.decode_augment_train_batch_u8(
                    datas, boxes, self.image_size, flips, orders, factors)
            else:
                xs, status = native.decode_augment_train_batch(
                    datas, boxes, self.image_size, flips, orders, factors,
                    IMAGENET_MEAN, IMAGENET_STD)
        else:
            if u8:
                xs, status = native.decode_augment_val_batch_u8(
                    datas, 256, self.image_size)
            else:
                xs, status = native.decode_augment_val_batch(
                    datas, 256, self.image_size, IMAGENET_MEAN, IMAGENET_STD)
        mean = _ZERO3 if u8 else IMAGENET_MEAN
        std = _ONE3 if u8 else IMAGENET_STD
        for j in np.nonzero(status)[0]:
            img = pil_imgs.get(j)
            if img is None:
                img_path = self.img_list[indices[j]][0]
                img = self.loader(os.path.join(self.root, img_path))
            arr = np.asarray(img, np.uint8)
            if self.training:
                x = native.augment_train_from_array(
                    arr, boxes[j], self.image_size, flips[j], orders[j],
                    factors[j], mean, std)
            else:
                x = native.augment_val(arr, 256, self.image_size, mean, std)
            xs[j] = quantize_u8(x) if u8 else x
        return xs, ys


class DataLoader:
    """Threaded batch loader: shuffle per epoch, drop_last for static shapes
    (XLA needs fixed batch dims), prefetch via a bounded queue."""

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=4,
                 seed=0, drop_last=True, prefetch=4, pad_last=False):
        """pad_last: with drop_last=False, pad the final short batch to
        batch_size by repeating its last sample and yield
        (x, y, n_valid) 3-tuples so metrics can mask the padding — keeps
        XLA shapes static while evaluating EVERY sample (the reference
        evaluates the full val set, test.py:74-96)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # more loader threads than cores actively hurts (GIL convoy between
        # the threads' Python sections; measured 5x slower at 2 threads on a
        # 1-core host) — cap at the core count
        self.num_workers = max(1, min(num_workers, os.cpu_count() or 1))
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.pad_last = pad_last and not drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        order = np.arange(len(self.dataset))
        rng = np.random.default_rng((self.seed, self.epoch))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(bi):
            idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
            n_valid = len(idxs)
            if self.pad_last and n_valid < self.batch_size:
                idxs = np.concatenate(
                    [idxs, np.full(self.batch_size - n_valid, idxs[-1])])
            sub = np.random.default_rng((self.seed, self.epoch, bi))
            if getattr(self.dataset, "use_native", False):
                xs, ys = self.dataset.get_batch([int(i) for i in idxs], sub)
            else:
                dt = (np.uint8 if getattr(self.dataset, "output", "float32")
                      == "uint8" else np.float32)
                xs = np.empty((len(idxs), self.dataset.image_size,
                               self.dataset.image_size, 3), dt)
                ys = np.empty((len(idxs),), np.int32)
                for j, i in enumerate(idxs):
                    x, y = self.dataset.get(int(i), sub)
                    xs[j], ys[j] = x, y
            if self.pad_last:
                return xs, ys, n_valid
            return xs, ys

        def producer():
            # bounded sliding window of in-flight batches
            window = self.num_workers + self.prefetch
            def put(item):
                # bounded put that gives up when the consumer is gone, so
                # an abandoned iterator can't leave this thread blocked
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        return True
                    except queue.Full:
                        pass
                return False

            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    futs = {}
                    nxt = 0
                    for bi in range(nb):
                        while nxt < nb and len(futs) < window:
                            futs[nxt] = pool.submit(load_batch, nxt)
                            nxt += 1
                        if stop.is_set() or not put(futs.pop(bi).result()):
                            break
            except RuntimeError:
                if not stop.is_set():  # benign: consumer closed mid-epoch
                    raise
            put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


class DevicePrefetcher:
    """Overlap host->device transfer with compute: keep `depth` batches in
    flight via jax.device_put (the pin_memory/non_blocking equivalent,
    train_search.py:331-332)."""

    def __init__(self, it, depth=2, sharding=None):
        import jax
        self._jax = jax
        self.it = iter(it)
        self.depth = depth
        self.sharding = sharding
        self.buf = []

    def _put(self, batch):
        jax = self._jax
        if self.sharding is not None:
            if jax.process_count() > 1:
                # multi-host: each host contributes its local shard
                return tuple(jax.make_array_from_process_local_data(
                    self.sharding_for(b), b) for b in batch)
            return tuple(jax.device_put(b, self.sharding_for(b))
                         for b in batch)
        return tuple(jax.device_put(b) for b in batch)

    def sharding_for(self, b):
        return self.sharding

    def __iter__(self):
        for batch in self.it:
            self.buf.append(self._put(batch))
            if len(self.buf) > self.depth:
                yield self.buf.pop(0)
        while self.buf:
            yield self.buf.pop(0)
