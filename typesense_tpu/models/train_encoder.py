"""Train a small REAL text encoder from scratch and ship it as the default
semantic checkpoint.

The reference downloads pretrained ONNX models at runtime
(/root/reference/include/text_embedder.h:4-51, embedder_manager.h); this
image has no egress, so instead of seeded-random weights we train a genuine
encoder: a 2-layer BertModel (hidden 128) with mean pooling, InfoNCE over
paraphrase pairs from a synonym-clustered corpus. The model demonstrably
LEARNS synonym structure — texts sharing concepts but ZERO surface tokens
embed close (see tests/test_semantic_checkpoint.py) — and exercises the
full production path: torch checkpoint -> models/convert.py -> npz ->
JAX forward with WordPiece (parity-asserted in tests/test_embed_convert.py).

Run: python -m typesense_tpu.models.train_encoder [out_dir]
Deterministic (fixed seeds); ~2-4 min on one CPU core.
"""

from __future__ import annotations

import os
import random
import sys

# ~120 concept clusters x 3-5 synonyms: enough structure for a 128-d
# encoder to learn synonymy without memorizing sentences
CLUSTERS: list[list[str]] = [
    ["chicken", "poultry", "hen"], ["beef", "steak", "sirloin"],
    ["fish", "salmon", "trout", "seafood"], ["bread", "loaf", "baguette"],
    ["stew", "casserole", "potroast"], ["soup", "broth", "bisque"],
    ["cake", "gateau", "torte"], ["sweet", "sugary", "honeyed"],
    ["spicy", "hot", "fiery", "peppery"], ["fast", "quick", "rapid",
                                           "speedy"],
    ["slow", "gradual", "leisurely"], ["big", "large", "huge", "giant"],
    ["small", "tiny", "little", "mini"], ["car", "automobile", "vehicle"],
    ["bicycle", "bike", "cycle"], ["repair", "fix", "mend"],
    ["build", "construct", "assemble"], ["house", "home", "dwelling"],
    ["doctor", "physician", "medic"], ["illness", "disease", "sickness"],
    ["medicine", "drug", "remedy"], ["money", "cash", "currency"],
    ["buy", "purchase", "acquire"], ["sell", "vend", "trade"],
    ["happy", "glad", "joyful", "cheerful"], ["sad", "unhappy", "gloomy"],
    ["angry", "furious", "irate"], ["calm", "serene", "tranquil"],
    ["walk", "stroll", "amble"], ["run", "sprint", "jog", "dash"],
    ["jump", "leap", "hop"], ["throw", "toss", "hurl"],
    ["water", "aqua", "liquid"], ["fire", "flame", "blaze"],
    ["earth", "soil", "ground"], ["wind", "breeze", "gust"],
    ["mountain", "peak", "summit"], ["river", "stream", "creek"],
    ["ocean", "sea", "deep"], ["forest", "woods", "woodland"],
    ["city", "town", "metropolis"], ["village", "hamlet", "settlement"],
    ["road", "street", "avenue"], ["bridge", "span", "crossing"],
    ["music", "melody", "tune"], ["song", "ballad", "anthem"],
    ["dance", "waltz", "boogie"], ["paint", "draw", "sketch"],
    ["book", "novel", "volume"], ["story", "tale", "narrative"],
    ["teacher", "instructor", "tutor"], ["student", "pupil", "learner"],
    ["school", "academy", "institute"], ["work", "labor", "toil"],
    ["rest", "relax", "repose"], ["sleep", "slumber", "doze"],
    ["dream", "vision", "reverie"], ["light", "bright", "luminous"],
    ["dark", "dim", "shadowy"], ["cold", "chilly", "frigid"],
    ["warm", "toasty", "balmy"], ["rain", "drizzle", "shower"],
    ["snow", "sleet", "frost"], ["sun", "sunshine", "sol"],
    ["moon", "luna", "crescent"], ["star", "stellar", "celestial"],
    ["dog", "hound", "canine"], ["cat", "feline", "kitty"],
    ["horse", "stallion", "mare"], ["bird", "fowl", "avian"],
    ["tree", "oak", "timber"], ["flower", "blossom", "bloom"],
    ["fruit", "apple", "pear"], ["vegetable", "carrot", "turnip"],
    ["shirt", "blouse", "jersey"], ["shoes", "boots", "sneakers"],
    ["hat", "cap", "beanie"], ["coat", "jacket", "parka"],
    ["table", "desk", "bench"], ["chair", "seat", "stool"],
    ["window", "pane", "casement"], ["door", "gate", "portal"],
    ["phone", "telephone", "handset"], ["computer", "laptop", "machine"],
    ["screen", "display", "monitor"], ["keyboard", "keys", "keypad"],
    ["letter", "mail", "post"], ["message", "note", "memo"],
    ["friend", "pal", "buddy"], ["enemy", "foe", "rival"],
    ["king", "monarch", "ruler"], ["queen", "empress", "regent"],
    ["soldier", "warrior", "trooper"], ["battle", "combat", "skirmish"],
    ["peace", "truce", "harmony"], ["law", "statute", "regulation"],
    ["judge", "justice", "magistrate"], ["crime", "offense", "felony"],
    ["prison", "jail", "penitentiary"], ["ship", "boat", "vessel"],
    ["plane", "aircraft", "jet"], ["train", "railway", "locomotive"],
    ["journey", "trip", "voyage"], ["map", "chart", "atlas"],
    ["island", "isle", "atoll"], ["desert", "dunes", "wasteland"],
    ["gold", "bullion", "gilt"], ["silver", "sterling", "argent"],
    ["iron", "steel", "metal"], ["stone", "rock", "boulder"],
    ["glass", "crystal", "pane2"], ["paper", "parchment", "sheet"],
    ["knife", "blade", "dagger"], ["spoon", "ladle", "scoop"],
    ["plate", "dish", "platter"], ["cup", "mug", "goblet"],
    ["milk", "cream", "dairy"], ["cheese", "cheddar", "brie"],
    ["egg", "yolk", "omelet"], ["salt", "sodium", "brine"],
    ["pepper", "paprika", "cayenne"], ["garlic", "clove", "allium"],
]

SEED = 11


def build_vocab() -> list[str]:
    words = sorted({w for c in CLUSTERS for w in c})
    return ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words


def sample_pair(rng: random.Random, n_lo=3, n_hi=7):
    """Two renderings of the same concept sequence with independently
    chosen synonyms — a paraphrase pair with (usually) little overlap."""
    n = rng.randint(n_lo, n_hi)
    concepts = rng.sample(range(len(CLUSTERS)), n)
    a = " ".join(rng.choice(CLUSTERS[c]) for c in concepts)
    b = " ".join(rng.choice(CLUSTERS[c]) for c in concepts)
    return a, b


def main(out_dir: str = "/tmp/ts_mini_model", steps: int = 1200,
         batch: int = 64, lr: float = 3e-4):
    import numpy as np
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(SEED)
    rng = random.Random(SEED)
    os.makedirs(out_dir, exist_ok=True)
    vocab = build_vocab()
    with open(os.path.join(out_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(out_dir, "vocab.txt"),
                            do_lower_case=True)

    cfg = BertConfig(vocab_size=len(vocab), hidden_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=512, max_position_embeddings=64)
    model = BertModel(cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    temp = 0.07

    def encode(texts):
        enc = tok(texts, padding=True, truncation=True, max_length=32,
                  return_tensors="pt")
        out = model(**enc).last_hidden_state
        m = enc["attention_mask"].unsqueeze(-1).float()
        emb = (out * m).sum(1) / m.sum(1).clamp(min=1)
        return torch.nn.functional.normalize(emb, dim=1)

    model.train()
    for step in range(1, steps + 1):
        pairs = [sample_pair(rng) for _ in range(batch)]
        ea = encode([p[0] for p in pairs])
        eb = encode([p[1] for p in pairs])
        logits = ea @ eb.T / temp
        labels = torch.arange(batch)
        loss = (torch.nn.functional.cross_entropy(logits, labels) +
                torch.nn.functional.cross_entropy(logits.T, labels)) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 100 == 0 or step == 1:
            print(f"step {step} loss {loss.item():.4f}", flush=True)

    model.eval()
    model.save_pretrained(out_dir)
    tok.save_pretrained(out_dir)
    print(f"saved HF model to {out_dir}", flush=True)

    from typesense_tpu.models.convert import convert_hf
    ckpt_dir = os.path.join(os.path.dirname(__file__), "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    out_npz = os.path.join(ckpt_dir, "ts_ts-mini.npz")
    convert_hf(out_dir, out_npz)
    print(f"converted -> {out_npz} "
          f"({os.path.getsize(out_npz) / 1e6:.2f} MB)", flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
