"""TransE KG-embedding training vs an exact pure-numpy oracle twin."""

import hashlib
import math

import numpy as np
import pytest

from kgce.operators.kgembed import (
    entity_vectors_for_ann,
    init_embeddings,
    train_transe,
)

DIM, EPOCHS, LR, MARGIN, SEED, AVG_BUCKET = 8, 3, 0.8, 1.0, 0, 4

# small KG: 12 entities, 3 predicates, a mix of chains/hubs/cycles
TRIPLES = [
    (1, "per_loc", 10), (2, "per_loc", 10), (3, "per_loc", 11),
    (4, "per_loc", 11), (5, "per_loc", 12),
    (1, "org_per", 2), (2, "org_per", 3), (3, "org_per", 4),
    (6, "org_per", 1), (7, "org_per", 5),
    (10, "loc_loc", 11), (11, "loc_loc", 12), (12, "loc_loc", 10),
    (6, "per_loc", 12), (7, "per_loc", 10),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _init_vec(key, dim, seed):
    bound = 6.0 / math.sqrt(dim)
    v = np.array(
        [
            _h60(f"{key}:{i}:{seed}") / float(1 << 60) * (2.0 * bound) - bound
            for i in range(dim)
        ]
    )
    return v / np.linalg.norm(v)


def _py_transe(triples, dim, epochs, lr, margin, seed, avg_bucket):
    ents = sorted({s for s, _, _ in triples} | {o for _, _, o in triples})
    preds = sorted({p for _, p, _ in triples})
    n_buckets = max(1, len(ents) // avg_bucket)
    E = {e: _init_vec(str(e), dim, seed) for e in ents}
    R = {p: _init_vec(p, dim, seed) for p in preds}
    buckets = {}
    for e in ents:
        buckets.setdefault(_h60(str(e)) % n_buckets, []).append(e)
    losses = []
    for epoch in range(epochs):
        gE = {e: np.zeros(dim) for e in ents}
        gR = {p: np.zeros(dim) for p in preds}
        loss, n_scored = 0.0, 0
        for s, p, o in triples:
            tag = f"{s}:{p}:{o}:{epoch}:{seed}"
            cands = buckets.get(_h60(tag) % n_buckets, [])
            if not cands:  # empty bucket: the triple sits out this epoch
                continue
            n_scored += 1
            tb = hashlib.md5((tag + "#tb").encode()).hexdigest()
            neg = min(cands, key=lambda e: _h60(f"{tb}@{e}"))
            d = E[s] + R[p] - E[o]
            dn = E[s] + R[p] - E[neg]
            hinge = margin + float(d @ d) - float(dn @ dn)
            if hinge <= 0:
                continue
            loss += hinge
            gE[s] += 2 * (d - dn)
            gR[p] += 2 * (d - dn)
            gE[o] += -2 * d
            gE[neg] += 2 * dn
        n_scored = max(n_scored, 1)
        losses.append(loss / n_scored)
        step = lr / n_scored
        for e in ents:
            v = E[e] - step * gE[e]
            E[e] = v / np.linalg.norm(v)
        for p in preds:
            R[p] = R[p] - step * gR[p]
    return E, R, losses


@pytest.fixture(scope="module")
def edges_df(spark):
    rows = [(s, p, o, f"s{s}", f"o{o}", 1.0, 1) for s, p, o in TRIPLES]
    return spark.createDataFrame(
        rows,
        "subj_id long, pred string, obj_id long, subj_text string, "
        "obj_text string, confidence double, n_evidence long",
    )


@pytest.fixture(scope="module")
def trained(edges_df):
    return train_transe(
        edges_df, dim=DIM, epochs=EPOCHS, lr=LR, margin=MARGIN,
        seed=SEED, avg_bucket=AVG_BUCKET,
    )


def test_init_matches_python_twin(spark):
    ids = spark.createDataFrame([(e,) for e in (1, 2, 42)], "id long")
    got = {r.id: np.array(r.vec) for r in
           init_embeddings(ids, "id", DIM, SEED).collect()}
    for e, v in got.items():
        np.testing.assert_allclose(v, _init_vec(str(e), DIM, SEED), rtol=1e-12)


def test_transe_matches_python_twin(trained):
    ent_emb, rel_emb, losses = trained
    E, R, want_losses = _py_transe(
        TRIPLES, DIM, EPOCHS, LR, MARGIN, SEED, AVG_BUCKET
    )
    np.testing.assert_allclose(losses, want_losses, rtol=1e-9)
    got_E = {r.id: np.array(r.vec) for r in ent_emb.collect()}
    got_R = {r.pred: np.array(r.vec) for r in rel_emb.collect()}
    assert set(got_E) == set(E) and set(got_R) == set(R)
    for e in E:
        np.testing.assert_allclose(got_E[e], E[e], rtol=1e-9, atol=1e-12)
    for p in R:
        np.testing.assert_allclose(got_R[p], R[p], rtol=1e-9, atol=1e-12)


def test_transe_training_learns(trained):
    _, _, losses = trained
    # deterministic fixture: pinned that the hinge loss decreases
    assert losses[-1] < losses[0]


def test_entity_norms_stay_unit(trained):
    ent_emb, _, _ = trained
    for r in ent_emb.collect():
        assert abs(np.linalg.norm(np.array(r.vec)) - 1.0) < 1e-9


def test_negative_sampling_plan_stays_hash_aggregate(edges_df):
    """The candidate-collapse groupBy must be a HashAggregate (numeric
    min_by buffer) — a string tiebreak would force SortAggregate over
    the fanned-out candidate rows."""
    from pyspark.sql import functions as F
    from kgce.operators.kgembed import _entity_ids, _negative_ids

    triples = edges_df.select("subj_id", "pred", "obj_id").distinct()
    neg = _negative_ids(triples, _entity_ids(triples), 3, epoch=0, seed=0)
    plan = neg._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    # every triple gets at most one negative, drawn from the entity set
    rows = neg.collect()
    assert len(rows) == len(set(TRIPLES))
    ents = {e for s, _, o in TRIPLES for e in (s, o)}
    assert all(r.neg_id in ents for r in rows)


def test_vectors_feed_ann_near_dup(trained):
    """Learned vectors compose with the existing ANN machinery:
    embedding-driven entity near-dup detection runs over them."""
    from kgce.operators.ann import embedding_near_dup_pairs

    ent_emb, _, _ = trained
    vecs = entity_vectors_for_ann(ent_emb)
    assert dict(vecs.dtypes)["embedding"] == "array<float>"
    pairs = embedding_near_dup_pairs(
        vecs, threshold=-1.0, n_planes=2, id_col="id"
    )
    got = pairs.collect()
    assert all(r.a < r.b for r in got)  # canonical pair order, no dups


def _py_score(sv, pv, ov):
    # strict left-to-right fold, mirroring F.aggregate exactly
    acc = 0.0
    for i in range(len(sv)):
        v = (sv[i] + pv[i]) - ov[i]
        acc = acc + v * v
    return acc


def _py_ranks(E, R, held, known=None):
    out = {}
    for s, p, o in held:
        d_true = _py_score(E[s], R[p], E[o])
        better = 0
        for e in E:
            if e == o:
                continue
            if known is not None and (s, p, e) in known:
                continue
            d = _py_score(E[s], R[p], E[e])
            if d < d_true or (d == d_true and e < o):
                better += 1
        out[(s, p, o)] = better + 1
    return out


@pytest.mark.parametrize("filtered", [False, True])
def test_link_prediction_ranks_match_python(spark, edges_df, trained, filtered):
    from kgce.operators.kgembed import link_prediction_ranks

    ent_emb, rel_emb, _ = trained
    E = {r.id: list(r.vec) for r in ent_emb.collect()}
    R = {r.pred: list(r.vec) for r in rel_emb.collect()}
    held_triples = TRIPLES[::3]
    held = spark.createDataFrame(held_triples, "subj_id long, pred string, obj_id long")
    known = set(TRIPLES) if filtered else None
    got = {
        (r.subj_id, r.pred, r.obj_id): r.rank
        for r in link_prediction_ranks(
            ent_emb, rel_emb, held, filter_known=edges_df if filtered else None
        ).collect()
    }
    assert got == _py_ranks(E, R, held_triples, known)


def test_link_prediction_metrics(spark, trained):
    from kgce.operators.kgembed import link_prediction_metrics

    ranks = spark.createDataFrame(
        [(1, "p", 2, 1), (1, "p", 3, 4), (2, "p", 3, 20)],
        "subj_id long, pred string, obj_id long, rank long",
    )
    m = link_prediction_metrics(ranks, ks=(1, 10)).first()
    assert m.mean_rank == pytest.approx(25 / 3)
    assert m.mrr == pytest.approx((1 + 0.25 + 0.05) / 3)
    assert m.hits_at_1 == pytest.approx(1 / 3)
    assert m.hits_at_10 == pytest.approx(2 / 3)


def test_warm_start_matches_python_twin(spark, edges_df, trained):
    """Recrawl shape: continue training from a previous model over an
    UPDATED edge set (new entity 99, one edge dropped) — warm ids keep
    their vectors, new ids get md5 init, exact oracle parity holds."""
    from kgce.operators.kgembed import train_transe

    ent_emb, rel_emb, _ = trained
    new_triples = TRIPLES[1:] + [(99, "per_loc", 10), (99, "org_per", 1)]
    rows = [(s, p, o, f"s{s}", f"o{o}", 1.0, 1) for s, p, o in new_triples]
    edges2 = spark.createDataFrame(rows, edges_df.schema)
    got_E_df, got_R_df, losses = train_transe(
        edges2, dim=DIM, epochs=1, lr=LR, margin=MARGIN, seed=SEED,
        avg_bucket=AVG_BUCKET, warm_ent=ent_emb, warm_rel=rel_emb,
    )

    # python twin: init from the trained model, md5 init for entity 99
    E0, R0, _ = _py_transe(TRIPLES, DIM, EPOCHS, LR, MARGIN, SEED, AVG_BUCKET)
    ents = sorted({s for s, _, _ in new_triples} | {o for _, _, o in new_triples})
    n_buckets = max(1, len(ents) // AVG_BUCKET)
    E = {e: E0.get(e, _init_vec(str(e), DIM, SEED)) for e in ents}
    R = dict(R0)
    buckets = {}
    for e in ents:
        buckets.setdefault(_h60(str(e)) % n_buckets, []).append(e)
    gE = {e: np.zeros(DIM) for e in ents}
    gR = {p: np.zeros(DIM) for p in R}
    loss, n_scored = 0.0, 0
    for s, p, o in new_triples:
        tag = f"{s}:{p}:{o}:0:{SEED}"
        cands = buckets.get(_h60(tag) % n_buckets, [])
        if not cands:
            continue
        n_scored += 1
        tb = hashlib.md5((tag + "#tb").encode()).hexdigest()
        neg = min(cands, key=lambda e: _h60(f"{tb}@{e}"))
        d = E[s] + R[p] - E[o]
        dn = E[s] + R[p] - E[neg]
        hinge = MARGIN + float(d @ d) - float(dn @ dn)
        if hinge <= 0:
            continue
        loss += hinge
        gE[s] += 2 * (d - dn); gR[p] += 2 * (d - dn)
        gE[o] += -2 * d; gE[neg] += 2 * dn
    n_scored = max(n_scored, 1)
    step = LR / n_scored
    for e in ents:
        v = E[e] - step * gE[e]
        E[e] = v / np.linalg.norm(v)
    for p in R:
        R[p] = R[p] - step * gR[p]

    np.testing.assert_allclose(losses, [loss / n_scored], rtol=1e-9)
    got_E = {r.id: np.array(r.vec) for r in got_E_df.collect()}
    assert set(got_E) == set(ents)  # dropped-edge-only entities vanish
    for e in ents:
        np.testing.assert_allclose(got_E[e], E[e], rtol=1e-9, atol=1e-12)
    got_R = {r.pred: np.array(r.vec) for r in got_R_df.collect()}
    for p in R:
        np.testing.assert_allclose(got_R[p], R[p], rtol=1e-9, atol=1e-12)
