from libpostal_spark.corpus import generate_corpus


def test_deterministic():
    a = generate_corpus(n_base=50, seed=42)
    b = generate_corpus(n_base=50, seed=42)
    assert a.equals(b)
    c = generate_corpus(n_base=50, seed=43)
    assert not a.content.equals(c.content)


def test_xform_classes_present():
    pdf = generate_corpus(n_base=200, dup_fraction=0.6, seed=42)
    xf = set(pdf.xform)
    for cls in ["base", "exact", "ws", "comment", "case", "unicode", "rename",
                "edit_small", "clone_embed", "boilerplate", "negative"]:
        assert cls in xf, f"missing xform class {cls}"


def test_fid_unique():
    pdf = generate_corpus(n_base=100, seed=42)
    assert pdf.fid.is_unique


def test_boilerplate_identical():
    pdf = generate_corpus(n_base=20, n_boilerplate_copies=10, seed=42)
    bp = pdf[pdf.xform == "boilerplate"]
    per_cluster = bp.groupby("cluster_id").content.nunique()
    assert (per_cluster == 1).all()
