"""Vendored CLIP BPE tokenizer: bit-identical ids vs HF ``CLIPTokenizer``.

Builds a genuine (small) CLIP-style vocab by running byte-pair-merge
training over the shipped prompts, writes vocab.json/merges.txt, and
asserts our ``ClipTokenizer`` produces the exact ids transformers does —
including truncation, eos-padding, contractions, unicode, CJK spacing,
and special-token literals. This pins the whole no-ftfy normalisation +
BPE path the runtime now uses instead of HF (VERDICT.md item 7).
"""

import collections
import json
import os

import numpy as np
import pytest

from motionclone_tpu.io.tokenizer import BOS, EOS, ClipTokenizer, bytes_to_unicode

transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def shipped_prompts():
    prompts = []
    for name in os.listdir(os.path.join(REPO, "configs")):
        if name.endswith(".jsonl"):
            with open(os.path.join(REPO, "configs", name)) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        if "new_prompt" in rec:
                            prompts.append(rec["new_prompt"])
    assert len(prompts) >= 15
    return prompts


EDGE_CASES = [
    "",
    "   ",
    "A CAT, sitting  on\tthe mat!!!",
    "it's the cat's pajamas; they'll've gone",
    "café naïve résumé — déjà vu",  # accents kept (strip_accents=False)
    "数字 video of 猫 running",  # CJK spacing
    "a photo of a dog " * 40,  # > 77 tokens -> truncation
    "<|startoftext|> hi <|endoftext|>",
    "emoji 🚀 and digits 12345",
    "hyphen-ated and under_scored words",
]


def train_mini_bpe(texts, num_merges=400):
    """Tiny byte-pair-merge trainer producing a CLIP-shaped vocab/merges."""
    byte_enc = bytes_to_unicode()
    words = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            mapped = "".join(byte_enc[b] for b in w.encode("utf-8"))
            words[tuple(mapped[:-1]) + (mapped[-1] + "</w>",)] += 1

    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for word, n in words.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic tie-break for reproducibility
        (a, b), cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        new_words = collections.Counter()
        for word, n in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += n
        words = new_words

    base = list(byte_enc.values())
    vocab_toks = base + [t + "</w>" for t in base] + [a + b for a, b in merges]
    vocab_toks += [BOS, EOS]
    vocab = {t: i for i, t in enumerate(vocab_toks)}
    return vocab, merges


@pytest.fixture(scope="module")
def tok_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_tok")
    vocab, merges = train_mini_bpe(shipped_prompts() + EDGE_CASES)
    vocab_file = str(d / "vocab.json")
    merges_file = str(d / "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    hf = transformers.CLIPTokenizer(vocab_file=vocab_file, merges_file=merges_file)
    ours = ClipTokenizer(vocab_file, merges_file)
    return hf, ours


def test_bit_identical_on_shipped_prompts(tok_pair):
    hf, ours = tok_pair
    for prompt in shipped_prompts():
        # real SD checkpoints set model_max_length=77 via tokenizer_config.json;
        # the bare constructor leaves it at the VERY_LARGE_INTEGER sentinel
        ref = hf(
            prompt,
            padding="max_length",
            max_length=77,
            truncation=True,
            return_tensors="np",
        ).input_ids
        got = ours.encode_padded(prompt)
        np.testing.assert_array_equal(got, ref, err_msg=prompt)


def test_bit_identical_on_edge_cases(tok_pair):
    hf, ours = tok_pair
    for text in EDGE_CASES:
        ref = hf(
            text,
            padding="max_length",
            max_length=77,
            truncation=True,
            return_tensors="np",
        ).input_ids
        got = ours.encode_padded(text)
        np.testing.assert_array_equal(got, ref, err_msg=repr(text))


def test_raw_token_streams_match(tok_pair):
    hf, ours = tok_pair
    for text in shipped_prompts() + EDGE_CASES:
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_from_pretrained_layout(tok_pair, tmp_path):
    _, ours = tok_pair
    sub = tmp_path / "ckpt" / "tokenizer"
    sub.mkdir(parents=True)
    with open(sub / "vocab.json", "w", encoding="utf-8") as fh:
        json.dump(ours.encoder, fh, ensure_ascii=False)
    with open(sub / "merges.txt", "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for (a, b), _ in sorted(ours.bpe_ranks.items(), key=lambda kv: kv[1]):
            fh.write(f"{a} {b}\n")
    loaded = ClipTokenizer.from_pretrained(str(tmp_path / "ckpt"))
    text = "a cat surfing a wave"
    np.testing.assert_array_equal(
        loaded.encode_padded(text), ours.encode_padded(text)
    )


def test_decode_roundtrip(tok_pair):
    _, ours = tok_pair
    text = "a cat running on the grass"
    ids = ours.encode(text)
    assert ours.decode(ids) == text


def test_runtime_has_no_transformers_import():
    """The runtime path must not import transformers (VERDICT.md item 7)."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import motionclone_tpu.pipeline.runner\n"
        "import motionclone_tpu.cli\n"
        "import motionclone_tpu.io.tokenizer\n"
        "assert 'transformers' not in sys.modules, 'transformers leaked in'\n"
    )
    # cwd on sys.path, NOT PYTHONPATH (which breaks axon plugin discovery,
    # see PERF.md)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
