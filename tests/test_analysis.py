"""Analyzer unit tests: Porter stemmer published-vocabulary cases +
tokenization/stop-word behavior pinned by the reference
(tests/test_controllers.py:254-272,527-552).
"""

from metastore_spark.search.analysis import analyze, porter_stem


def test_porter_classic_cases():
    # Examples from the published algorithm (Porter 1980)
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "caress": "caress",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "sing": "sing",
        "conflated": "conflat",
        "troubling": "troubl",
        "sized": "size",
        "hopping": "hop",
        "falling": "fall",
        "hissing": "hiss",
        "fizzed": "fizz",
        "failing": "fail",
        "filing": "file",
        "happy": "happi",
        "sky": "sky",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "valenci": "valenc",
        "digitizer": "digit",
        "operator": "oper",
        "feudalism": "feudal",
        "decisiveness": "decis",
        "hopefulness": "hope",
        "formaliti": "formal",
        "triplicate": "triplic",
        "formative": "form",
        "formalize": "formal",
        "electriciti": "electr",
        "electrical": "electr",
        "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "airliner": "airlin",
        "gyroscopic": "gyroscop",
        "adjustable": "adjust",
        "defensible": "defens",
        "irritant": "irrit",
        "replacement": "replac",
        "adjustment": "adjust",
        "dependent": "depend",
        "adoption": "adopt",
        "homologou": "homolog",
        "communism": "commun",
        "activate": "activ",
        "angulariti": "angular",
        "homologous": "homolog",
        "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat",
        "rate": "rate",
        "cease": "ceas",
        "controll": "control",
        "roll": "roll",
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, word


def test_stem_countries_matches_country():
    assert porter_stem("countries") == porter_stem("country") == "countri"


def test_analyze_removes_stopwords():
    assert analyze("the Mauna Loa") == ["mauna", "loa"]
    assert analyze("The United States") == ["unit", "state"]


def test_analyze_possessive_and_empty():
    assert analyze("The dataset's owner") == ["dataset", "owner"]
    assert analyze("") == []
    assert analyze(None) == []
