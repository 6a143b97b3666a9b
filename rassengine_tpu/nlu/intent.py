"""Query-intent classification over the 12-intent taxonomy.

Reference ``classify_intent`` (app/main.py:2613-2634) zero-shots a
bart-large-mnli over 12 hypothesis pairs per query. Here classification is a
single on-TPU forward of a fine-tuned Flax BERT head (trained by
train/intent_train.py on the same synthetic distribution the reference's
train_intent.py uses), with a deterministic rule classifier as fallback when no
trained weights exist. The reference's unused ``INTENT_THRESHOLD`` (main.py:2415)
is honored for real: model predictions below it fall back to the rules.
"""

from __future__ import annotations

import logging
import re

import numpy as np

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import ALL_INTENTS, QueryIntent

log = logging.getLogger("rassengine.intent")

# ordered (intent, pattern) rules — first match wins
_RULES: list[tuple[QueryIntent, re.Pattern]] = [
    (QueryIntent.DOCUMENT_FETCH,
     re.compile(r"\b(fetch|retrieve|download|show me|pull up|get)\b.*\b(document|record|file|report|chart)s?\b", re.I)),
    (QueryIntent.AGGREGATE,
     re.compile(r"\b(how many|count|number of|total|average|most common|least common|statistics|distribution|breakdown)\b", re.I)),
    (QueryIntent.COMPARISON,
     re.compile(r"\b(compare|versus|vs\.?|difference between|differences|better than|worse than|higher than|lower than|against)\b", re.I)),
    (QueryIntent.TEMPORAL,
     re.compile(r"\b(when|recent(ly)?|latest|last (year|month|week|visit)|history of|over time|timeline|since \d|before \d|after \d|past (year|month|week))\b", re.I)),
    (QueryIntent.EXPLANATORY,
     re.compile(r"\b(why|explain|meaning of|what does .{1,40} mean|how does|interpret|elaborate)\b", re.I)),
    (QueryIntent.MULTI_INTENT,
     re.compile(r"\?.+\?|\balso\b.+\b(and|plus)\b|\b(and also|as well as)\b", re.I)),
    (QueryIntent.KEYWORD,
     re.compile(r'"[^"]+"|\b[A-Z]\d{2}(\.\d+)?\b|\b\d{4,5}-?\d?\b')),
    (QueryIntent.STRUCTURED,
     re.compile(r"\b(status|gender|date of birth|dob|marital|dosage|priority|criticality|blood type)\b", re.I)),
    (QueryIntent.ENTITY_SPECIFIC,
     re.compile(r"\b(dr\.?|doctor|practitioner|organization|hospital|clinic)\s+[A-Z]", re.I)),
    (QueryIntent.HYBRID_STRUCTURED,
     re.compile(r"\b(with|whose|having)\b.*\b(condition|medication|allergy|procedure|observation)\b", re.I)),
]


class RuleIntentClassifier:
    def classify(self, query: str) -> tuple[QueryIntent, float]:
        q = query or ""
        for intent, pat in _RULES:
            if pat.search(q):
                return intent, 0.9
        # default: short keyword-ish queries → HYBRID, questions → SEMANTIC
        if len(q.split()) <= 3:
            return QueryIntent.HYBRID, 0.5
        return QueryIntent.SEMANTIC, 0.5


# words too common/structural to carry intent evidence
_STOPWORDS = frozenset(
    "the a an of for in on at to is are was were do does did show me my any "
    "all with and or what which who how this that please can could would "
    "list give find tell".split())


def content_words(text: str) -> list[str]:
    return [w for w in re.findall(r"[a-z]+", (text or "").lower())
            if len(w) >= 3 and w not in _STOPWORDS]


# light suffix stripper (longest match, one strip, stem stays ≥3 chars):
# unseen cue-word SURFACE FORMS are usually morphological variants of
# trained ones ("exactly"/"exact", "summarize"/"summary",
# "comparison"/"compare") — stem-level cue tables generalize to them with
# no pretraining, which a word-level table cannot (VERDICT r2 #2 follow-up)
_SUFFIXES = sorted((
    "ations", "ation", "izing", "ising", "ility", "ities", "ments",
    "ment", "ison", "izes", "ized", "izer", "ize", "ise", "ies",
    "ions", "ion", "ity", "ers", "est", "ing", "ed", "es", "ly",
    "al", "er", "s", "y", "e"), key=len, reverse=True)


def stem(word: str) -> str:
    for suf in _SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[: len(word) - len(suf)]
    return word


class ModelIntentClassifier:
    """Fine-tuned Flax BERT head (see train/intent_train.py)."""

    def __init__(self, path: str):
        import json
        import os

        if not os.path.exists(os.path.join(path, "params.msgpack")):
            raise FileNotFoundError(path)  # before any jax work (compile cost)
        import jax

        from rassengine_tpu.models.bert import BertConfig, BertForSequenceClassification
        from rassengine_tpu.models.tokenizer import load_tokenizer
        from rassengine_tpu.models.weights import load_params
        from rassengine_tpu.train.serialization import load_model_meta

        meta = load_model_meta(path)
        cfg = (BertConfig(**{**meta["bert_config"], "remat": False})
               if meta else BertConfig.tiny())  # remat is training-only
        self.model = BertForSequenceClassification(cfg, num_labels=len(ALL_INTENTS))
        # bucket to the TRAINED sequence length (train/intent_train.py
        # truncates to 64): longer buckets would feed position embeddings
        # training never updated. Shipped checkpoints predate the meta key,
        # so the default matches their recipe.
        self.max_len = int((meta or {}).get("max_seq_len", 64))
        self.tokenizer = load_tokenizer(path, cfg.vocab_size, self.max_len)
        dummy = np.zeros((1, 8), np.int32)
        template = self.model.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy))
        params = load_params(path, template)
        if params is None:
            raise FileNotFoundError(path)
        # commit once: host-numpy params re-upload per jitted forward
        # (models/embedder.py measured the cost on tunneled chips)
        self.params = jax.device_put(params)
        self._fwd = jax.jit(self.model.apply)
        # discriminative cue words seen in training (train/intent_train.py
        # writes cue_words.json): word → the intent its training occurrences
        # concentrate in. Slot values (names, conditions, meds) spread across
        # all intents by construction, so only true cue words qualify.
        # Two granularities ship (round 3, measured on the off-dist splits):
        # the exact-word table gates the MODEL (stemming the gate cost 4 pts
        # in-distribution — collisions admit wrong predictions), while the
        # stem table feeds the VOTE channel, where occurrence-purity
        # filtering keeps only stems that still discriminate.
        # round 4: MLM-pretrained backbones ship a train-time-calibrated
        # OOV confidence bound (train/intent_train.py:calibrate_oov_conf) —
        # above it the model is trusted even WITHOUT cue support. From-
        # scratch checkpoints never set it (their softmax is confidently
        # wrong on unseen cue vocabularies, VERDICT r2 #2), so absence keeps
        # the round-3 gate semantics exactly.
        self.oov_conf: float | None = (meta or {}).get("oov_conf")
        self.cue_intent: dict[str, str] | None = None
        self.stem_cues: dict[str, str] = {}
        self.trained_words: frozenset[str] = frozenset()
        cue_path = os.path.join(path, "cue_words.json")
        if os.path.exists(cue_path):
            with open(cue_path) as f:
                meta_c = json.load(f)
                cues = meta_c["cues"]
                # legacy list format carried no intents; treat as wildcard
                self.cue_intent = (dict.fromkeys(cues, "*")
                                   if isinstance(cues, list) else cues)
                self.stem_cues = meta_c.get("stem_cues", {})
                self.trained_words = frozenset(
                    meta_c.get("trained_words", ()))

    def supported_intents(self, query: str) -> set[str] | None:
        """Intents for which this query carries trained cue evidence, or
        None when no cue table was shipped (legacy checkpoints trust the
        model unconditionally). The production gate is SELF-CONSISTENCY: the
        model's prediction counts only if one of the query's cue words votes
        for that same intent — on unseen cue vocabularies the model is
        confidently wrong (VERDICT r2 #2) and its prediction finds no
        supporting cue, so the rules decide (measured: hard split 0.49 vs
        0.4725 rules / 0.215 raw model; paraphrase 0.9785 vs rules 0.71)."""
        if self.cue_intent is None:
            return None
        return {self.cue_intent[w] for w in content_words(query)
                if w in self.cue_intent}

    def cue_votes(self, query: str,
                  model_intent: str | None = None) -> "Counter":
        """Per-intent counts of trained cue STEMS present in the query — a
        lexical classifier channel that generalizes morphologically where
        the BERT head cannot ("comparison" votes COMPARISON via trained
        "compare"/"compared": unseen surface forms have untrained
        embeddings, but their stems carry the evidence across).

        Round-4 precision guards (each A/B-measured on the three eval
        splits — the shipped combination Pareto-dominates a hard base-form
        block: hard/unseen-cue 0.4988→0.5200, paraphrase 0.9762→0.9663,
        in-dist −0.001):
        - a word SEEN in training but absent from the exact-cue table was
          judged ambiguous by occurrence purity — its stem must not
          resurrect it (measured no-op on the eval splits, but it closes
          the audited real-query hijack class for free);
        - a bare BASE form (w == stem(w)) is where suffix-stripping
          collisions land ("higher"→"high", "many"→"man"): it votes only
          when it corroborates ``model_intent`` — the model's raw
          prediction. On unseen-cue queries the model is wrong AND the
          collision vote disagrees with it, so the hijack is blocked
          ("high blood pressure" must not vote COMPARISON via trained
          "higher"); on paraphrase queries the model is right but was
          gate-rejected, and the agreeing base vote restores it. True
          inflected variants (w != stem) keep unconditional votes — they
          are the case the channel exists for.
        """
        from collections import Counter

        votes: Counter = Counter()
        for w in content_words(query):
            s = stem(w)
            if w in self.trained_words and (
                    self.cue_intent is None or w not in self.cue_intent):
                continue
            it = self.stem_cues.get(s)
            if not it or it == "*":
                continue
            if s == w and it != model_intent:
                continue
            votes[it] += 1
        return votes

    def classify(self, query: str) -> tuple[QueryIntent, float]:
        return self.classify_batch([query])[0]

    def classify_batch(self, queries: list[str]
                       ) -> list[tuple[QueryIntent, float]]:
        """One forward for the whole batch (engine.retrieve_batch skips the
        per-query device round-trip). Batch dim pads to the next power of two
        to bound the jit cache."""
        import jax.nn

        ids, mask = self.tokenizer.encode_batch(queries, self.max_len)
        nb = 1 << (len(queries) - 1).bit_length()
        if nb != ids.shape[0]:
            ids = np.concatenate(
                [ids, np.zeros((nb - ids.shape[0], ids.shape[1]), ids.dtype)])
            mask = np.concatenate(
                [mask, np.zeros((nb - mask.shape[0], mask.shape[1]),
                                mask.dtype)])
        logits = self._fwd(self.params, ids, mask)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[: len(queries)]
        out = []
        for b in range(len(queries)):
            i = int(np.argmax(probs[b]))
            out.append((QueryIntent(ALL_INTENTS[i]), float(probs[b, i])))
        return out


class IntentClassifier:
    """Model when trained weights exist, rules otherwise.

    The production policy (VERDICT r2 #2 — never lose to the rule baseline):
    1. the model's predicted intent must be SUPPORTED by a trained cue word
       of that intent in the query (self-consistency; the softmax stays
       confidently wrong on out-of-vocabulary cues, so OOV-cue support, not
       confidence, is the gate),
    2. model confidence below INTENT_THRESHOLD → fall through,
    3. a precise rule pattern match (conf 0.9) decides next,
    4. then unambiguous cue-stem votes (round 3: the stem table maps unseen
       morphological variants of trained cues to their intent — evidence
       the BERT head cannot use because those surface forms are untrained;
       round 4: seen-but-impure words never vote, and bare base forms —
       where stem collisions land — vote only when they corroborate the
       model's raw prediction; see ModelIntentClassifier.cue_votes),
    5. otherwise the rules' length-based default.
    """

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()
        self.rules = RuleIntentClassifier()
        self.model: ModelIntentClassifier | None = None
        try:
            self.model = ModelIntentClassifier(self.config.intent_model_path)
            log.info("intent model loaded from %s", self.config.intent_model_path)
        except Exception:
            log.info("no trained intent model; using rule classifier")

    def classify(self, query: str) -> tuple[QueryIntent, float]:
        return self.classify_batch([query])[0]

    def classify_batch(self, queries: list[str]
                       ) -> list[tuple[QueryIntent, float]]:
        """Batch form: one model forward, then the per-query production gate."""
        if self.model is None:
            return [self.rules.classify(q) for q in queries]
        batch_fn = getattr(self.model, "classify_batch", None)
        preds = (batch_fn(queries) if batch_fn is not None
                 else [self.model.classify(q) for q in queries])
        out = []
        for q, (intent, conf) in zip(queries, preds):
            support = self.model.supported_intents(q)
            supported = (support is None or "*" in support
                         or intent.value in support)
            if supported and conf >= self.config.intent_threshold:
                out.append((intent, conf))
                continue
            # calibrated OOV trust: a pretrained-backbone model whose
            # confidence is measured to be reliable on held-out unseen-cue
            # data (oov_conf from train-time calibration) may win without
            # cue support — the subword vocabulary gives unseen surface
            # forms trained embeddings, unlike the from-scratch models the
            # cue gate was built for. Restricted to queries with NO cue
            # evidence at all (support == ∅): when in-vocabulary cues
            # actively support a DIFFERENT intent, the query is
            # contradicted, not out-of-vocabulary, and calibrate_oov_conf
            # only measured the unseen-cue split (ADVICE r4)
            oov_conf = getattr(self.model, "oov_conf", None)
            if (not supported and support is not None and not support
                    and oov_conf is not None and conf >= oov_conf):
                out.append((intent, conf))
                continue
            rule_intent, rule_conf = self.rules.classify(q)
            if rule_conf >= 0.9:  # a precise rule pattern matched
                out.append((rule_intent, rule_conf))
                continue
            votes = self.model.cue_votes(q, model_intent=intent.value)
            if votes:
                best, n = votes.most_common(1)[0]
                if sum(1 for v in votes.values() if v == n) == 1:
                    out.append((QueryIntent(best), 0.6))
                    continue
            out.append((rule_intent, rule_conf))
        return out


def classify_intent(query: str, classifier: IntentClassifier | None = None) -> str:
    """Reference-parity helper (main.py:2613): query → intent label string."""
    clf = classifier or IntentClassifier()
    return clf.classify(query)[0].value
