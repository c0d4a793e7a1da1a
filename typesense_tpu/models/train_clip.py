"""Train a small REAL CLIP from scratch and ship it as the default
image-search checkpoint.

The reference auto-downloads pretrained CLIP ONNX by MD5 at runtime
(/root/reference/include/image_embedder.h, embedder_manager.h:36-60); this
image has no egress, so — like ts-mini for text (train_encoder.py) — we
train a genuine two-tower CLIP: a ViT vision tower over procedurally drawn
images (colored shapes on colored backgrounds) and a causal text tower over
caption renderings, InfoNCE both directions. Color/shape SYNONYMS appear
only in captions, so the model demonstrably learns a shared semantic space:
a query "crimson disc" retrieves a drawn red circle it never saw captioned
that way (tests/test_clip_mini.py).

Both towers export through the production convert path
(models/convert.py convert_clip_state_dict / convert_clip_text_state_dict)
into models/checkpoints/, where EmbedderManager loads them by default for
model_name "ts/clip-mini".

Run: python -m typesense_tpu.models.train_clip [steps]
Deterministic (fixed seeds); ~4-8 min on one CPU core.
"""

from __future__ import annotations

import os
import random
import sys

SEED = 23
IMG = 64

# visual concepts: canonical name -> RGB. Synonyms share the visual but
# only ever appear in text.
COLORS = {
    "red": (220, 40, 40), "green": (40, 180, 60), "blue": (40, 70, 220),
    "yellow": (230, 220, 50), "purple": (150, 50, 200),
    "orange": (240, 140, 30), "white": (245, 245, 245),
    "black": (20, 20, 20), "pink": (250, 150, 190), "gray": (128, 128, 128),
}
COLOR_SYN = {
    "red": ["red", "crimson", "scarlet"], "green": ["green", "emerald"],
    "blue": ["blue", "azure", "navy"], "yellow": ["yellow", "golden"],
    "purple": ["purple", "violet"], "orange": ["orange", "tangerine"],
    "white": ["white", "ivory"], "black": ["black", "ebony"],
    "pink": ["pink", "rose"], "gray": ["gray", "ashen"],
}
SHAPES = ["circle", "square", "triangle", "diamond", "cross", "ring",
          "stripe", "dot"]
SHAPE_SYN = {
    "circle": ["circle", "disc", "round"], "square": ["square", "box"],
    "triangle": ["triangle", "wedge"], "diamond": ["diamond", "rhombus"],
    "cross": ["cross", "plus"], "ring": ["ring", "hoop"],
    "stripe": ["stripe", "band", "bar"], "dot": ["dot", "dots", "speckle"],
}
FILLER = ["a", "on", "background", "with", "the", "shape", "drawn"]


def build_vocab() -> list[str]:
    words = sorted({w for v in COLOR_SYN.values() for w in v}
                   | {w for v in SHAPE_SYN.values() for w in v}
                   | set(FILLER))
    return ["[PAD]", "[BOS]", "[EOS]", "[UNK]"] + words


def draw_image(color: str, shape: str, bg: str, rng: random.Random):
    """(IMG, IMG, 3) uint8 — one `shape` in `color` on a `bg` field, with
    jittered geometry so the tower can't memorize pixel positions."""
    from PIL import Image, ImageDraw
    img = Image.new("RGB", (IMG, IMG), COLORS[bg])
    d = ImageDraw.Draw(img)
    c = COLORS[color]
    cx = rng.randint(22, 42)
    cy = rng.randint(22, 42)
    r = rng.randint(12, 20)
    if shape == "circle":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=c)
    elif shape == "square":
        d.rectangle([cx - r, cy - r, cx + r, cy + r], fill=c)
    elif shape == "triangle":
        d.polygon([(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)], fill=c)
    elif shape == "diamond":
        d.polygon([(cx, cy - r), (cx + r, cy), (cx, cy + r), (cx - r, cy)],
                  fill=c)
    elif shape == "cross":
        w = max(3, r // 3)
        d.rectangle([cx - r, cy - w, cx + r, cy + w], fill=c)
        d.rectangle([cx - w, cy - r, cx + w, cy + r], fill=c)
    elif shape == "ring":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=c)
        d.ellipse([cx - r // 2, cy - r // 2, cx + r // 2, cy + r // 2],
                  fill=COLORS[bg])
    elif shape == "stripe":
        w = max(4, r // 2)
        d.rectangle([0, cy - w, IMG, cy + w], fill=c)
    elif shape == "dot":
        for _ in range(9):
            px, py = rng.randint(6, IMG - 6), rng.randint(6, IMG - 6)
            d.ellipse([px - 3, py - 3, px + 3, py + 3], fill=c)
    return img


def caption(color: str, shape: str, bg: str, rng: random.Random) -> str:
    cw = rng.choice(COLOR_SYN[color])
    sw = rng.choice(SHAPE_SYN[shape])
    bw = rng.choice(COLOR_SYN[bg])
    forms = [f"a {cw} {sw} on {bw}", f"{cw} {sw} on a {bw} background",
             f"the {cw} {sw}", f"{cw} {sw}"]
    return rng.choice(forms)


def sample_concept(rng: random.Random):
    color = rng.choice(list(COLORS))
    bg = rng.choice([b for b in COLORS if b != color])
    shape = rng.choice(SHAPES)
    return color, shape, bg


def main(steps: int = 700, batch: int = 48, lr: float = 1e-3):
    import numpy as np
    import torch
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(SEED)
    rng = random.Random(SEED)
    vocab = build_vocab()
    word_id = {w: i for i, w in enumerate(vocab)}
    BOS, EOS, UNK = 1, 2, 3
    MAXL = 12

    cfg = CLIPConfig.from_text_vision_configs(
        text_config=__import__("transformers").CLIPTextConfig(
            vocab_size=len(vocab), hidden_size=128, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=256,
            max_position_embeddings=MAXL, bos_token_id=BOS,
            eos_token_id=EOS),
        vision_config=__import__("transformers").CLIPVisionConfig(
            hidden_size=128, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=256, image_size=IMG, patch_size=16),
        projection_dim=128)
    model = CLIPModel(cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=lr)

    from typesense_tpu.models.embedder import CLIP_MEAN, CLIP_STD

    def tok(texts):
        ids = np.zeros((len(texts), MAXL), np.int64)
        eos_pos = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            row = [BOS] + [word_id.get(w, UNK)
                           for w in t.split()][:MAXL - 2] + [EOS]
            ids[i, :len(row)] = row
            eos_pos[i] = len(row) - 1
        return torch.tensor(ids), torch.tensor(eos_pos)

    def text_feats(texts):
        ids, eos_pos = tok(texts)
        out = model.text_model(input_ids=ids,
                               attention_mask=(ids != 0).long())
        pooled = out.last_hidden_state[torch.arange(len(texts)), eos_pos]
        emb = model.text_projection(pooled)
        return torch.nn.functional.normalize(emb, dim=1)

    def image_feats(pixels):
        emb = model.get_image_features(pixel_values=pixels)
        return torch.nn.functional.normalize(emb, dim=1)

    temp = 0.07
    model.train()
    for step in range(1, steps + 1):
        concepts = [sample_concept(rng) for _ in range(batch)]
        px = np.stack([
            (np.asarray(draw_image(c, s, b, rng), np.float32) / 255.0
             - CLIP_MEAN) / CLIP_STD
            for c, s, b in concepts]).transpose(0, 3, 1, 2)
        caps = [caption(c, s, b, rng) for c, s, b in concepts]
        ei = image_feats(torch.tensor(px))
        et = text_feats(caps)
        logits = ei @ et.T / temp
        labels = torch.arange(batch)
        loss = (torch.nn.functional.cross_entropy(logits, labels)
                + torch.nn.functional.cross_entropy(logits.T, labels)) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == 1:
            acc = (logits.argmax(1) == labels).float().mean().item()
            print(f"step {step} loss {loss.item():.4f} acc {acc:.2f}",
                  flush=True)

    model.eval()
    from typesense_tpu.models.convert import (convert_clip_state_dict,
                                              convert_clip_text_state_dict)
    ckpt_dir = os.path.join(os.path.dirname(__file__), "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    sd = model.state_dict()
    vis = convert_clip_state_dict(sd, n_heads=4, image_size=IMG,
                                  patch_size=16, precision="f32")
    np.savez_compressed(os.path.join(ckpt_dir, "ts_clip-mini.vision.npz"),
                        **vis)
    txt = convert_clip_text_state_dict(sd, n_heads=4, vocab=vocab,
                                       bos_id=BOS, eos_id=EOS, unk_id=UNK,
                                       precision="f32")
    np.savez_compressed(os.path.join(ckpt_dir, "ts_clip-mini.npz"), **txt)
    for fn in ("ts_clip-mini.vision.npz", "ts_clip-mini.npz"):
        p = os.path.join(ckpt_dir, fn)
        print(f"wrote {p} ({os.path.getsize(p) / 1e6:.2f} MB)", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
