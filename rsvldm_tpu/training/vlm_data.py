"""LLaVA supervised-finetuning data pipeline.

Parity target: /root/reference llava/train/train.py — the per-template
conversation preprocessors that produce IGNORE_INDEX-masked labels
(preprocess_llama3 :639-722, preprocess_qwen/chatml :563-636,
preprocess_v1 :725-801, preprocess_plain :885-904, dispatch :907-955),
LazySupervisedDataset (:958-1243: json/jsonl/yaml loading with
first/end/random sampling strategies, lengths / modality_lengths),
DataCollatorForSupervisedDataset (:1246-1289) and the length-grouped
batching of llava_trainer.py (:56-153).

TPU design notes: the collator additionally pads to a bucket multiple so a
whole epoch reuses a handful of compiled train-step programs (HF pads to
the longest-in-batch, which under jit would recompile per batch), and the
samplers are pure numpy (seeded Generator) instead of torch randperm.

Tokenizers are duck-typed: preprocessors take an `encode` callable (no
special tokens added) plus a SpecialTokens table, so tests run without HF
tokenizer assets and real runs pass `tok.encode`.
"""

from __future__ import annotations

import dataclasses
import json
import math
import re
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

IGNORE_INDEX = -100          # llava/constants.py:9
IMAGE_TOKEN_INDEX = -200     # llava/constants.py:7
DEFAULT_IMAGE_TOKEN = "<image>"

LLAMA3_SYSTEM = ("You are a helpful language and vision assistant. "
                 "You are able to understand the visual content that the "
                 "user provides, and assist the user with a variety of "
                 "tasks using natural language.")  # train.py:644
QWEN_SYSTEM = "You are a helpful assistant."       # train.py:563

_ROLES = {"human": "user", "gpt": "assistant", "user": "user",
          "assistant": "assistant", "system": "system"}


def _norm_msg(msg: Dict) -> tuple[str, str]:
    """Accept both {'from','value'} and {'role','content'} (train.py:688)."""
    role = msg.get("role", msg.get("from"))
    content = msg.get("content", msg.get("value"))
    return _ROLES.get(role, role), content


def _encode_with_image(text: str, encode: Callable[[str], List[int]]
                       ) -> List[int]:
    """tokenizer_image_token: splice IMAGE_TOKEN_INDEX at <image> (the one
    implementation lives in models/vlm/generate.py)."""
    from ..models.vlm.generate import tokenize_with_image
    return tokenize_with_image(text, encode).tolist()


@dataclasses.dataclass(frozen=True)
class Llama3Special:
    bos: int = 128000            # <|begin_of_text|>
    start_header: int = 128006   # <|start_header_id|>
    end_header: int = 128007     # <|end_header_id|>
    eot: int = 128009            # <|eot_id|>
    nl: int = 271                # "\n\n" single token

    @property
    def unmask(self) -> tuple:
        # train.py:661-662: structural tokens stay supervised everywhere
        return (self.bos, self.start_header, self.end_header, self.eot,
                self.nl)


def preprocess_llama3(source: Sequence[Dict], encode,
                      sp: Llama3Special = Llama3Special(),
                      system_message: str = LLAMA3_SYSTEM
                      ) -> tuple[np.ndarray, np.ndarray]:
    """One conversation -> (input_ids, labels) with assistant spans (and
    structural tokens) supervised (preprocess_llama3, train.py:639-722).
    Message rendering mirrors the llama-3 chat template:
    <|begin_of_text|> then per message
    <|start_header_id|>{role}<|end_header_id|>\\n\\n{content}<|eot_id|>."""
    msgs = list(source)
    if msgs and _norm_msg(msgs[0])[0] != "user":
        msgs = msgs[1:]
    ids: List[int] = [sp.bos]
    labels: List[int] = [IGNORE_INDEX]

    def seg(role: str, content: str) -> List[int]:
        return ([sp.start_header] + encode(role) + [sp.end_header]
                + _encode_with_image("\n\n" + content, encode) + [sp.eot])

    sys_seg = seg("system", system_message)
    ids += sys_seg
    labels += [IGNORE_INDEX] * len(sys_seg)
    for msg in msgs:
        role, content = _norm_msg(msg)
        s = seg(role, content)
        ids += s
        labels += (s if role == "assistant" else [IGNORE_INDEX] * len(s))
    ids_np = np.asarray(ids, np.int32)
    labels_np = np.asarray(labels, np.int32)
    for t in sp.unmask:
        labels_np[ids_np == t] = t
    labels_np[ids_np == IMAGE_TOKEN_INDEX] = IGNORE_INDEX
    return ids_np, labels_np


@dataclasses.dataclass(frozen=True)
class ChatMLSpecial:
    im_start: int = 151644
    im_end: int = 151645
    nl: int = 198                # "\n"

    @property
    def unmask(self) -> tuple:
        return (self.nl, self.im_start, self.im_end)  # train.py:577


def preprocess_chatml(source: Sequence[Dict], encode,
                      sp: ChatMLSpecial = ChatMLSpecial(),
                      system_message: str = QWEN_SYSTEM
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Qwen/chatml template (preprocess_qwen, train.py:563-636):
    <|im_start|>{role}\\n{content}<|im_end|>\\n per message."""
    msgs = list(source)
    if msgs and _norm_msg(msgs[0])[0] != "user":
        msgs = msgs[1:]

    def seg(role: str, content: str) -> List[int]:
        return ([sp.im_start] + encode(role)
                + _encode_with_image("\n" + content, encode)
                + [sp.im_end, sp.nl])

    ids: List[int] = []
    labels: List[int] = []
    sys_seg = seg("system", system_message)
    ids += sys_seg
    labels += [IGNORE_INDEX] * len(sys_seg)
    for msg in msgs:
        role, content = _norm_msg(msg)
        s = seg(role, content)
        ids += s
        labels += (s if role == "assistant" else [IGNORE_INDEX] * len(s))
    ids_np = np.asarray(ids, np.int32)
    labels_np = np.asarray(labels, np.int32)
    for t in sp.unmask:
        labels_np[ids_np == t] = t
    labels_np[ids_np == IMAGE_TOKEN_INDEX] = IGNORE_INDEX
    return ids_np, labels_np


def preprocess_v1(source: Sequence[Dict], encode, bos: int = 1,
                  sep2_id: int = 2, system: str = "",
                  boundary_compat: bool = False,
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Vicuna v1 (preprocess_v1, train.py:725-801): rendered as
    '{system} USER: {q} ASSISTANT: {a}</s>...'; only assistant responses
    (+ the closing </s>) supervise.

    Default path tokenizes each ROUND as one string (rounds are delimited
    by the hard </s>/sep2 boundary, so the concatenation equals whole-
    conversation tokenization) and masks by the cumulative prompt-prefix
    span — the token STREAM matches inference-time tokenization exactly;
    only the mask boundary can shift by one BPE merge, which beats the
    reference's separate (prompt, answer) chunk tokenization with -2/-1
    length fudges (train.py:777-786).

    boundary_compat=True APPROXIMATES the reference's chunked tokenization
    (prompt and answer encoded separately, so seam-crossing BPE merges are
    split like the reference splits them). It is NOT exact-id parity: the
    reference builds input_ids from the WHOLE conversation and only its
    label mask uses the chunked lengths (with -2/-1 sentencepiece fudges,
    train.py:777-786) — matching that bug-for-bug is tokenizer-specific.
    Prefer the default path, whose ids equal inference tokenization."""
    msgs = list(source)
    if msgs and _norm_msg(msgs[0])[0] != "user":
        msgs = msgs[1:]
    ids: List[int] = [bos]
    labels: List[int] = [IGNORE_INDEX]
    head = encode(system + " ") if system else []
    ids += head
    labels += [IGNORE_INDEX] * len(head)
    for i in range(0, len(msgs) - 1, 2):
        _, q = _norm_msg(msgs[i])
        _, a = _norm_msg(msgs[i + 1])
        if boundary_compat:
            prompt = _encode_with_image(f"USER: {q} ASSISTANT: ", encode)
            answer = _encode_with_image(a, encode) + [sep2_id]
            ids += prompt + answer
            labels += [IGNORE_INDEX] * len(prompt) + answer
        else:
            prompt_text = f"USER: {q} ASSISTANT: "
            round_ids = _encode_with_image(prompt_text + a, encode)
            # clamp: a merge across the prompt|answer seam can make the
            # joint encoding shorter than the prompt-only encoding
            prompt_len = min(len(_encode_with_image(prompt_text, encode)),
                             len(round_ids))
            ids += round_ids + [sep2_id]
            labels += [IGNORE_INDEX] * prompt_len \
                + round_ids[prompt_len:] + [sep2_id]
    if len(msgs) % 2 == 1:
        # trailing unpaired human turn: the reference renders the full
        # conversation, so the prompt tokens are IN input_ids (masked) —
        # dropping them would diverge the stream (conversation.py
        # SeparatorStyle.TWO renders 'USER: q ' with no assistant header)
        _, q = _norm_msg(msgs[-1])
        tail = _encode_with_image(f"USER: {q} ", encode)
        ids += tail
        labels += [IGNORE_INDEX] * len(tail)
    ids_np = np.asarray(ids, np.int32)
    labels_np = np.asarray(labels, np.int32)
    labels_np[ids_np == IMAGE_TOKEN_INDEX] = IGNORE_INDEX
    return ids_np, labels_np


def preprocess_plain(source: Sequence[Dict], encode, sep: str = "\n",
                     bos: Optional[int] = None
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Pretraining alignment format (preprocess_plain, train.py:885-904):
    input = [bos] + <image> + answer + sep; only the answer span
    supervises. The reference tokenizes via tokenizer_image_token whose
    first chunk carries the tokenizer's BOS — pass the model's bos id for
    parity (train_vlm wires tokenizer.bos_token_id)."""
    assert len(source) == 2
    _, first = _norm_msg(source[0])
    assert DEFAULT_IMAGE_TOKEN in first
    _, answer = _norm_msg(source[1])
    prompt_ids = ([] if bos is None else [bos]) \
        + _encode_with_image(DEFAULT_IMAGE_TOKEN, encode)
    ids = prompt_ids + encode(answer + sep)
    labels = [IGNORE_INDEX] * len(prompt_ids) + ids[len(prompt_ids):]
    ids_np = np.asarray(ids, np.int32)
    labels_np = np.asarray(labels, np.int32)
    return ids_np, labels_np


def normalize_multimodal(source: Sequence[Dict]) -> List[Dict]:
    """preprocess_multimodal (train.py:381-406): every message containing
    <image> has the token(s) moved to the front as '<image>\\n' — raw SFT
    data often carries a mid-text placeholder, and training must see the
    same leading-image layout inference produces."""
    out = []
    for msg in source:
        role_key = "value" if "value" in msg else "content"
        content = msg.get(role_key, "")
        if DEFAULT_IMAGE_TOKEN in content:
            n = content.count(DEFAULT_IMAGE_TOKEN)
            content = content.replace(DEFAULT_IMAGE_TOKEN, "").strip()
            content = ((DEFAULT_IMAGE_TOKEN + "\n") * n + content).strip()
            msg = {**msg, role_key: content}
        out.append(msg)
    return out


PREPROCESSORS = {
    "llama_3": preprocess_llama3,
    "llama_v3": preprocess_llama3,
    "qwen": preprocess_chatml,
    "chatml": preprocess_chatml,
    "v1": preprocess_v1,
    "plain": preprocess_plain,
}


def preprocess(source: Sequence[Dict], encode, template: str, **kw
               ) -> tuple[np.ndarray, np.ndarray]:
    """Template dispatch (train.py:907-955)."""
    if template not in PREPROCESSORS:
        raise ValueError(f"unknown conversation template: {template}")
    return PREPROCESSORS[template](source, encode, **kw)


# ----------------------------------------------------------------- dataset

class LazyConversationDataset:
    """LazySupervisedDataset equivalent (train.py:958-1243): records load
    eagerly (they are small), tokenization/image decode happen per item.

    data_path: .json (list of records), .jsonl, a brace list
    'base{a,b}.json', or a .yaml manifest with per-dataset
    sampling_strategy first/end/random:N or N%."""

    def __init__(self, data_path: str, encode, template: str = "llama_3",
                 image_folder: str = "", process_image: Optional[Callable] = None,
                 seed: int = 0, preprocess_kw: Optional[Dict] = None,
                 video_folder: str = "", video_fps: int = 1,
                 frames_upbound: int = 0, force_sample: bool = False,
                 add_time_instruction: bool = False,
                 process_frame: Optional[Callable] = None):
        """Video knobs mirror the reference DataArguments (train.py:
        134-137): records with a "video" key load frame folders
        ("shareVideoGPTV" paths) or container files (mp4/avi via
        models/vlm/video.py::process_video); process_frame(pil) -> array
        preprocesses each sampled frame (defaults to raw PIL frames)."""
        self.encode = encode
        self.template = template
        self.image_folder = Path(image_folder) if image_folder else None
        self.process_image = process_image
        self.video_folder = Path(video_folder) if video_folder else None
        self.video_fps = video_fps
        self.frames_upbound = frames_upbound
        self.force_sample = force_sample
        self.add_time_instruction = add_time_instruction
        self.process_frame = process_frame
        self.preprocess_kw = preprocess_kw or {}
        self.records: List[Dict] = self._load(str(data_path), seed)

    @staticmethod
    def _read_one(path: str) -> List[Dict]:
        if path.endswith(".jsonl"):
            with open(path) as f:
                return [json.loads(ln) for ln in f if ln.strip()]
        with open(path) as f:
            return json.load(f)

    def _load(self, data_path: str, seed: int) -> List[Dict]:
        out: List[Dict] = []
        m = re.match(r"^(.*)\{(.*)\}\.json$", data_path)
        if m:
            base, names = m.groups()
            for n in names.split(","):
                out.extend(self._read_one(f"{base}{n}.json"))
            return out
        if data_path.endswith(".yaml"):
            import yaml
            with open(data_path) as f:
                manifest = yaml.safe_load(f)
            rng = np.random.default_rng(seed)
            for ds in manifest["datasets"]:
                cur = self._read_one(ds["json_path"])
                strat = ds.get("sampling_strategy", "all")
                if ":" in strat:
                    strat, num = strat.split(":")
                    if "%" in num:
                        n = math.ceil(int(num.rstrip("%")) * len(cur) / 100)
                    else:
                        n = int(num)
                    if strat == "first":
                        cur = cur[:n]
                    elif strat == "end":
                        cur = cur[-n:]
                    elif strat == "random":
                        cur = [cur[i] for i in rng.permutation(len(cur))[:n]]
                out.extend(cur)
            return out
        return self._read_one(data_path)

    def __len__(self) -> int:
        return len(self.records)

    @property
    def lengths(self) -> List[int]:
        """Word-count proxy lengths, +128 when an image is present
        (train.py:1045-1050)."""
        out = []
        for rec in self.records:
            img = 128 if "image" in rec else 0
            out.append(img + sum(len(c.get("value", c.get("content", ""))
                                     .split()) for c in rec["conversations"]))
        return out

    @property
    def modality_lengths(self) -> List[int]:
        """Positive for multimodal records, negative for text-only
        (train.py:1053-1062)."""
        out = []
        for rec in self.records:
            n = sum(len(c.get("value", c.get("content", "")).split())
                    for c in rec["conversations"])
            out.append(n if ("image" in rec or "video" in rec) else -n)
        return out

    def _load_images(self, rec: Dict):
        """'image' may be a path or a LIST of paths (multi-image records,
        train.py:1144-1152); returns the processed image(s) in kind."""
        path = rec["image"]
        paths = path if isinstance(path, list) else [path]
        imgs = [self.process_image(
            str(self.image_folder / p) if self.image_folder else p)
            for p in paths]
        return imgs if isinstance(path, list) else imgs[0]

    def _load_video(self, rec: Dict, conv):
        """train.py:1155-1205 video branch: "shareVideoGPTV" frame folders
        sample 10 uniform frames at an assumed 2 fps; container files
        decode through process_video (the decord path on OpenCV). The
        optional time instruction is prepended to the first turn with the
        <image> token re-placed in front, verbatim (train.py:1199-1201)."""
        import copy as _copy

        from PIL import Image

        from ..models.vlm.video import (process_video, sample_video_frames,
                                        time_instruction)
        path = rec["video"]
        vf = str(self.video_folder / path) if self.video_folder else path
        if "shareVideoGPTV" in vf:
            n = self.frames_upbound if self.force_sample else 10
            if n <= 0:
                raise ValueError(
                    "force_sample requires frames_upbound > 0 (it samples "
                    "exactly frames_upbound frames, train.py:1169-1172)")
            frames, video_time, frame_time = sample_video_frames(vf, n)
            num = len(frames)
        else:
            arr, video_time, frame_time, num = process_video(
                vf, self.video_fps, self.frames_upbound, self.force_sample)
            frames = [Image.fromarray(a) for a in arr]
        if self.add_time_instruction:
            instr = time_instruction(video_time, num, frame_time)
            conv = _copy.deepcopy(list(conv))
            first = conv[0].get("value", conv[0].get("content", ""))
            key = "value" if "value" in conv[0] else "content"
            conv[0][key] = (f"{DEFAULT_IMAGE_TOKEN}\n{instr}\n"
                            f"{first.replace(DEFAULT_IMAGE_TOKEN, '')}")
        return conv, frames

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.records[i]
        conv = rec["conversations"]
        frames = None
        # 'image' takes precedence over 'video' like the reference's
        # if/elif (train.py:1103/1155) — never decode a video the image
        # branch will win over anyway
        if "video" in rec and "image" not in rec:
            conv, frames = self._load_video(rec, conv)
        if "image" in rec or "video" in rec:
            conv = normalize_multimodal(conv)   # train.py:1153
        ids, labels = preprocess(conv, self.encode,
                                 self.template, **self.preprocess_kw)
        item: Dict[str, Any] = {"input_ids": ids, "labels": labels,
                                "id": rec.get("id", i)}
        if "image" in rec and self.process_image is not None:
            item["image"] = self._load_images(rec)
        elif frames is not None:
            item["video"] = ([self.process_frame(f) for f in frames]
                             if self.process_frame else frames)
        return item


class LazyPreferenceDataset(LazyConversationDataset):
    """DPO preference pairs (train_dpo.py:1241-1289 tokenize_batch_element):
    records {"prompt", "chosen", "rejected", optional "image"} become TWO
    single-turn conversations through the same template preprocessors, so
    the masking rules (prompt IGNOREd, answer supervised) match SFT."""

    @staticmethod
    def _make_conv(prompt: str, answer: str) -> List[Dict]:
        return [{"from": "human", "value": prompt},
                {"from": "gpt", "value": answer}]

    @property
    def lengths(self) -> List[int]:
        out = []
        for rec in self.records:
            img = 128 if "image" in rec else 0
            out.append(img + sum(len(rec.get(k, "").split())
                                 for k in ("prompt", "chosen", "rejected")))
        return out

    @property
    def modality_lengths(self) -> List[int]:
        out = []
        for rec in self.records:
            n = sum(len(rec.get(k, "").split())
                    for k in ("prompt", "chosen", "rejected"))
            out.append(n if "image" in rec else -n)
        return out

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.records[i]
        item: Dict[str, Any] = {"id": rec.get("id", i)}
        for side in ("chosen", "rejected"):
            ids, labels = preprocess(
                self._make_conv(rec["prompt"], rec[side]), self.encode,
                self.template, **self.preprocess_kw)
            item[f"{side}_input_ids"] = ids
            item[f"{side}_labels"] = labels
        if "image" in rec and self.process_image is not None:
            item["image"] = self._load_images(rec)
        return item


# ---------------------------------------------------------------- collator

def collate(instances: Sequence[Dict], pad_id: int = 0,
            max_length: Optional[int] = None, pad_to_multiple: int = 64,
            padding_side: str = "right") -> Dict[str, np.ndarray]:
    """DataCollatorForSupervisedDataset equivalent (train.py:1246-1289):
    truncate to max_length, pad input_ids with pad_id / labels with
    IGNORE_INDEX, attention_mask = not-pad. Additionally rounds the padded
    length up to `pad_to_multiple` so epochs reuse a few jit buckets."""
    ids = [np.asarray(x["input_ids"])[:max_length] for x in instances]
    labels = [np.asarray(x["labels"])[:max_length] for x in instances]
    width = max(len(x) for x in ids)
    if pad_to_multiple:
        width = -(-width // pad_to_multiple) * pad_to_multiple
    if max_length:
        # bucket rounding must not pad past the caller's stated cap (rows
        # are already truncated to it, so the extra columns were pure pad)
        width = min(width, max_length)
    b = len(ids)
    out_ids = np.full((b, width), pad_id, np.int32)
    out_labels = np.full((b, width), IGNORE_INDEX, np.int32)
    mask = np.zeros((b, width), bool)
    for j, (x, y) in enumerate(zip(ids, labels)):
        if padding_side == "left":
            out_ids[j, width - len(x):] = x
            out_labels[j, width - len(y):] = y
            mask[j, width - len(x):] = True
        else:
            out_ids[j, :len(x)] = x
            out_labels[j, :len(y)] = y
            mask[j, :len(x)] = True
    batch = {"input_ids": out_ids, "labels": out_labels,
             "attention_mask": mask}
    if any("image" in x for x in instances):
        # modality-grouped ordering merges its trailing partial megabatches
        # across modalities, so mixed batches are NORMAL — text-only rows
        # carry None (the reference pads with a dummy zero image instead,
        # train.py:1232-1238; None keeps the no-vision-forward invariant)
        batch["images"] = [x.get("image") for x in instances]
    if any("video" in x for x in instances):
        batch["videos"] = [x.get("video") for x in instances]
    return batch


# ---------------------------------------------------- length-grouped order

def split_to_even_chunks(indices: List[int], lengths: Sequence[int],
                         num_chunks: int) -> List[List[int]]:
    """llava_trainer.py:56-76 verbatim semantics (greedy shortest-chunk)."""
    if len(indices) % num_chunks != 0:
        return [indices[i::num_chunks] for i in range(num_chunks)]
    per = len(indices) // num_chunks
    chunks: List[List[int]] = [[] for _ in range(num_chunks)]
    totals = [0.0] * num_chunks
    for idx in indices:
        short = totals.index(min(totals))
        chunks[short].append(idx)
        totals[short] += lengths[idx]
        if len(chunks[short]) == per:
            totals[short] = float("inf")
    return chunks


def get_length_grouped_indices(lengths: Sequence[int], batch_size: int,
                               world_size: int, seed: int = 0) -> List[int]:
    """llava_trainer.py:133-154: random permutation -> megabatches ->
    sort-by-length desc inside each -> even chunks per rank."""
    rng = np.random.default_rng(seed)
    indices = rng.permutation(len(lengths)).tolist()
    mb = batch_size * world_size
    megabatches = [indices[i:i + mb] for i in range(0, len(indices), mb)]
    megabatches = [sorted(m, key=lambda i: lengths[i], reverse=True)
                   for m in megabatches]
    chunked = [split_to_even_chunks(m, lengths, world_size)
               for m in megabatches]
    return [i for m in chunked for chunk in m for i in chunk]


def get_modality_length_grouped_indices(lengths: Sequence[int],
                                        batch_size: int, world_size: int,
                                        seed: int = 0) -> List[int]:
    """llava_trainer.py:95-131: group multimodal (len>0) and text-only
    (len<0) separately, interleave megabatches, trailing partials merged."""
    assert all(l != 0 for l in lengths), "zero-length sample"
    if all(l > 0 for l in lengths) or all(l < 0 for l in lengths):
        # SIGNED lengths pass through (llava_trainer.py:109-111): an
        # all-text-only corpus therefore sorts shortest-absolute first,
        # exactly like the reference — abs() here would flip the order
        return get_length_grouped_indices(lengths, batch_size, world_size,
                                          seed)
    mm = [(i, l) for i, l in enumerate(lengths) if l > 0]
    lang = [(i, -l) for i, l in enumerate(lengths) if l < 0]
    # order each modality by its own length-grouped permutation
    mm_order = get_length_grouped_indices([l for _, l in mm], batch_size,
                                          world_size, seed)
    lang_order = get_length_grouped_indices([l for _, l in lang], batch_size,
                                            world_size, seed)
    mm_shuffle = [mm[j][0] for j in mm_order]
    lang_shuffle = [lang[j][0] for j in lang_order]
    mb = batch_size * world_size
    mm_mega = [mm_shuffle[i:i + mb] for i in range(0, len(mm_shuffle), mb)]
    lang_mega = [lang_shuffle[i:i + mb]
                 for i in range(0, len(lang_shuffle), mb)]
    additional = (mm_mega[-1] if mm_mega else []) + \
        (lang_mega[-1] if lang_mega else [])
    megabatches = mm_mega[:-1] + lang_mega[:-1]
    rng = np.random.default_rng(seed + 1)
    megabatches = [megabatches[i] for i in rng.permutation(len(megabatches))]
    if additional:
        megabatches.append(sorted(additional))
    return [i for m in megabatches for i in m]


def iter_batches(dataset: LazyConversationDataset, batch_size: int,
                 world_size: int = 1, seed: int = 0, pad_id: int = 0,
                 max_length: Optional[int] = None, pad_to_multiple: int = 64,
                 group_by_modality_length: bool = True):
    """Epoch iterator: length-grouped order -> collated numpy batches ready
    for VLMTrainer.train_step (the LLaVATrainer._get_train_sampler +
    DataLoader pairing, llava_trainer.py:278-323)."""
    if group_by_modality_length:
        order = get_modality_length_grouped_indices(
            dataset.modality_lengths, batch_size, world_size, seed)
    else:
        order = get_length_grouped_indices(dataset.lengths, batch_size,
                                           world_size, seed)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idxs = order[i:i + batch_size]
        yield collate([dataset[j] for j in idxs], pad_id=pad_id,
                      max_length=max_length, pad_to_multiple=pad_to_multiple)
