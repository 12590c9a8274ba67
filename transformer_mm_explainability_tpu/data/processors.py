"""MMF-style sample processors (C29 datasets layer).

Host-side text/answer/bbox preparation feeding the jitted device
programs. Faithful ports of the processors on the VisualBERT VQA path
(VisualBERT/mmf/datasets/processors/processors.py and
bert_processors.py), registered under the reference names via
``core.registry`` so configs written for MMF resolve here:

  simple_word / simple_sentence   processors.py:823-860
  vqa_answer                      processors.py:529-714
  multi_hot_answer_from_vocab     processors.py:716-726
  bert_tokenizer / masked_token   bert_processors.py:16-173
  transformer_bbox                processors.py:1437-1465

Processors take/return plain dicts of numpy arrays (no torch, no
OmegaConf); configs are plain dicts.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..core.registry import registry
from .tokenization import BertTokenizer

SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")


def tokenize(sentence: str, keep=("'s",), remove=(",", "?")) -> List[str]:
    """mmf/utils/text.py:64-80."""
    sentence = sentence.lower()
    for token in keep:
        sentence = sentence.replace(token, " " + token)
    for token in remove:
        sentence = sentence.replace(token, "")
    return [t.strip() for t in SENTENCE_SPLIT_REGEX.split(sentence)
            if t.strip()]


def word_tokenize(word: str, remove=(",", "?")) -> str:
    """mmf/utils/text.py:83-92."""
    word = word.lower()
    for item in remove:
        word = word.replace(item, "")
    return word.replace("'s", " 's").strip()


class VocabDict:
    """mmf/utils/text.py:101-170: newline vocab file, <unk> prepended
    when absent."""

    UNK_TOKEN = "<unk>"

    def __init__(self, vocab_file: Optional[str] = None,
                 words: Optional[Sequence[str]] = None):
        if words is None:
            with open(vocab_file, encoding="utf-8") as f:
                words = [line.strip() for line in f if line.strip()]
        self.word_list = list(words)
        if self.UNK_TOKEN not in self.word_list:
            self.word_list = [self.UNK_TOKEN] + self.word_list
        self.word2idx_dict = {w: i for i, w in enumerate(self.word_list)}
        self.UNK_INDEX = self.word2idx_dict[self.UNK_TOKEN]
        self.num_vocab = len(self.word_list)

    def idx2word(self, idx: int) -> str:
        return self.word_list[idx]

    def word2idx(self, w: str) -> int:
        return self.word2idx_dict.get(w, self.UNK_INDEX)

    def __len__(self) -> int:
        return self.num_vocab


@registry.register_processor("simple_word")
class SimpleWordProcessor:
    def __init__(self, config: Optional[Dict] = None):
        pass

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        return {"text": word_tokenize(item["text"])}


@registry.register_processor("simple_sentence")
class SimpleSentenceProcessor:
    def __init__(self, config: Optional[Dict] = None):
        pass

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        return {"text": tokenize(item["text"])}


@registry.register_processor("vqa_answer")
class VQAAnswerProcessor:
    """processors.py:529-714. Scores follow the VQA accuracy formula:
    for each unique answer a, avg over the 10 leave-one-out subsets of
    min(1, matches/3) (compute_answers_scores, :681-707)."""

    DEFAULT_NUM_ANSWERS = 10

    def __init__(self, config: Dict[str, Any]):
        if "vocab_file" in config:
            self.answer_vocab = VocabDict(vocab_file=config["vocab_file"])
        else:
            self.answer_vocab = VocabDict(words=config["vocab"])
        self.num_answers = config.get("num_answers",
                                      self.DEFAULT_NUM_ANSWERS)
        prep = config.get("preprocessor")
        self.preprocessor = (registry.get("processor", prep)({})
                             if prep else None)

    def get_vocab_size(self) -> int:
        return self.answer_vocab.num_vocab

    def word2idx(self, word: str) -> int:
        return self.answer_vocab.word2idx(word)

    def idx2word(self, idx: int) -> str:
        return self.answer_vocab.idx2word(idx)

    def _increase_to_ten(self, tokens: List[str]) -> List[str]:
        while len(tokens) < self.DEFAULT_NUM_ANSWERS:
            tokens += tokens[:self.DEFAULT_NUM_ANSWERS - len(tokens)]
        return tokens

    def compute_answers_scores(self, answers_indices: np.ndarray
                               ) -> np.ndarray:
        scores = np.zeros((self.get_vocab_size(),), np.float32)
        gt_answers = list(enumerate(answers_indices.tolist()))
        for answer in set(answers_indices.tolist()):
            accs = []
            for gt_answer in gt_answers:
                others = [it for it in gt_answers if it != gt_answer]
                matching = [it for it in others if it[1] == answer]
                accs.append(min(1.0, len(matching) / 3.0))
            if answer != self.answer_vocab.UNK_INDEX:
                scores[answer] = sum(accs) / len(accs)
        return scores

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        if "answer_tokens" in item:
            tokens = list(item["answer_tokens"])
        elif item.get("answers") is not None:
            assert self.preprocessor is not None, (
                "'preprocessor' must be set when passing raw 'answers'")
            tokens = [self.preprocessor({"text": a})["text"]
                      for a in item["answers"]]
        else:
            raise AssertionError(
                "'answers' or 'answer_tokens' required")
        if tokens:
            tokens = self._increase_to_ten(tokens)
        answers_indices = np.full((self.DEFAULT_NUM_ANSWERS,),
                                  self.answer_vocab.UNK_INDEX, np.int64)
        for i, token in enumerate(tokens):
            answers_indices[i] = self.answer_vocab.word2idx(token)
        return {
            "answers": tokens,
            "answers_indices": answers_indices,
            "answers_scores": self.compute_answers_scores(answers_indices),
        }


@registry.register_processor("multi_hot_answer_from_vocab")
class MultiHotAnswerFromVocabProcessor(VQAAnswerProcessor):
    def compute_answers_scores(self, answers_indices: np.ndarray
                               ) -> np.ndarray:
        scores = np.zeros((self.get_vocab_size(),), np.float32)
        scores[answers_indices] = 1.0
        scores[self.answer_vocab.UNK_INDEX] = 0.0
        return scores


@registry.register_processor("masked_token")
class MaskedTokenProcessor:
    """bert_processors.MaskedTokenProcessor (:16-139): wordpiece both
    sides, pair-truncate, [CLS] a [SEP] (b [SEP]), BERT-style random
    masking, pad to max_seq_length. Randomness comes from an explicit
    ``np.random.RandomState`` (constructed from config seed) — never
    global state."""

    _MASK_TOKEN = "[MASK]"

    def __init__(self, config: Dict[str, Any]):
        tk = config.get("tokenizer_config", {})
        self._tokenizer = BertTokenizer(
            vocab_path=tk.get("vocab_path"), vocab=tk.get("vocab"))
        self._max_seq_length = config["max_seq_length"]
        self._probability = config.get("mask_probability", 0.15)
        self._rng = np.random.RandomState(config.get("seed", 0))
        self._mask_id = self._tokenizer.vocab.get(self._MASK_TOKEN, 103)

    def get_vocab_size(self) -> int:
        return len(self._tokenizer.vocab)

    def _random_word(self, ids: List[int], probability: float):
        labels = []
        for i, tid in enumerate(ids):
            prob = self._rng.random_sample()
            if probability > 0 and prob < probability:
                prob /= probability
                if prob < 0.8:
                    ids[i] = self._mask_id
                elif prob < 0.9:
                    ids[i] = int(self._rng.randint(self.get_vocab_size()))
                labels.append(tid)
            else:
                labels.append(-1)
        return ids, labels

    @staticmethod
    def _truncate_seq_pair(a: List[int], b: Optional[List[int]],
                           max_length: int):
        if b is None:
            b = []
        else:
            max_length -= 1
            assert max_length >= 0
        while len(a) + len(b) > max_length:
            (a if len(a) > len(b) else b).pop()

    def _convert_to_indices(self, ids_a: List[int],
                            ids_b: Optional[List[int]],
                            probability: float) -> Dict[str, np.ndarray]:
        tok = self._tokenizer
        ids_a, label_a = self._random_word(ids_a, probability)
        input_ids = [tok.cls] + ids_a + [tok.sep]
        segment_ids = [0] * len(input_ids)
        if ids_b:
            ids_b, label_b = self._random_word(ids_b, probability)
            lm_label_ids = [-1] + label_a + [-1] + label_b + [-1]
            input_ids += ids_b + [tok.sep]
            segment_ids += [1] * (len(ids_b) + 1)
        else:
            lm_label_ids = [-1] + label_a + [-1]
        input_mask = [1] * len(input_ids)
        while len(input_ids) < self._max_seq_length:
            input_ids.append(0)
            input_mask.append(0)
            segment_ids.append(0)
            lm_label_ids.append(-1)
        return {
            "input_ids": np.asarray(input_ids, np.int64),
            "input_mask": np.asarray(input_mask, np.int64),
            "segment_ids": np.asarray(segment_ids, np.int64),
            "lm_label_ids": np.asarray(lm_label_ids, np.int64),
            "tokens": [tok.inv.get(i, "[UNK]") for i in input_ids
                       if i != 0][:int(np.sum(input_mask))],
        }

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        ids_a = self._tokenizer.tokenize_ids(item["text_a"])
        text_b = item.get("text_b")
        ids_b = self._tokenizer.tokenize_ids(text_b) if text_b else None
        self._truncate_seq_pair(ids_a, ids_b, self._max_seq_length - 2)
        out = self._convert_to_indices(ids_a, ids_b, self._probability)
        if "is_correct" in item:
            out["is_correct"] = np.int64(item["is_correct"])
        return out


@registry.register_processor("bert_tokenizer")
class BertTokenizerProcessor(MaskedTokenProcessor):
    """bert_processors.BertTokenizer (:143-173): masking disabled."""

    def __init__(self, config: Dict[str, Any]):
        super().__init__(config)
        self._probability = 0.0

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        text_a = item["text"] if "text" in item else " ".join(item["tokens"])
        if isinstance(text_a, list):
            text_a = " ".join(text_a)
        ids_a = self._tokenizer.tokenize_ids(text_a)
        text_b = item.get("text_b")
        ids_b = self._tokenizer.tokenize_ids(text_b) if text_b else None
        self._truncate_seq_pair(ids_a, ids_b, self._max_seq_length - 2)
        out = self._convert_to_indices(ids_a, ids_b, self._probability)
        out["text"] = out["tokens"]
        return out


@registry.register_processor("transformer_bbox")
class TransformerBboxProcessor:
    """processors.py:1437-1465: xyxy boxes → 5-dim normalized
    [x0/w, y0/h, x1/w, y1/h, area_fraction]."""

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        config = config or {}
        self.bbox_key = config.get("bbox_key", "bbox")
        self.image_width_key = config.get("image_width_key", "image_width")
        self.image_height_key = config.get("image_height_key",
                                           "image_height")

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        bbox = np.asarray(item[self.bbox_key], np.float32)
        w = float(item[self.image_width_key])
        h = float(item[self.image_height_key])
        loc = np.zeros((bbox.shape[0], 5), np.float32)
        loc[:, :4] = bbox[:, :4]
        loc[:, 4] = ((loc[:, 3] - loc[:, 1]) * (loc[:, 2] - loc[:, 0])
                     / (w * h))
        loc[:, 0] /= w
        loc[:, 1] /= h
        loc[:, 2] /= w
        loc[:, 3] /= h
        out = dict(item)
        out["bbox"] = loc
        return out
