"""Registry parity vs the reference's constants (exact string equality of
class names, real-name descriptions, domains, and prompt grammar — these
determine the text anchors and therefore every published metric).

Skipped when the reference checkout isn't present (end-user machines)."""

import os

import pytest

REF_CONSTANTS = "/root/reference/dataset/constants.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.isfile(REF_CONSTANTS):
        pytest.skip("reference checkout not available")
    ns = {}
    with open(REF_CONSTANTS) as f:
        exec(compile(f.read(), REF_CONSTANTS, "exec"), ns)
    return ns


def test_class_names_match(ref):
    from aaclip_tpu.data.registry import CLASS_NAMES

    assert set(CLASS_NAMES) == set(ref["CLASS_NAMES"])
    for ds in ref["CLASS_NAMES"]:
        assert CLASS_NAMES[ds] == ref["CLASS_NAMES"][ds], ds


def test_real_names_match(ref):
    from aaclip_tpu.data.registry import REAL_NAMES

    assert REAL_NAMES == ref["REAL_NAMES"]


def test_domains_match(ref):
    from aaclip_tpu.data.registry import DOMAINS

    assert DOMAINS == ref["DOMAINS"]


def test_data_paths_match(ref):
    from aaclip_tpu.data.registry import DATASETS

    for name, path in ref["DATA_PATH"].items():
        rel = path.replace("./data/", "")
        assert DATASETS[name].rel_path == rel, name


def test_prompt_grammar_matches(ref):
    from aaclip_tpu.data.registry import (
        ABNORMAL_STATES, NORMAL_STATES, TEMPLATES, build_prompts)

    p = ref["PROMPTS"]
    assert list(NORMAL_STATES) == p["prompt_normal"]
    assert list(ABNORMAL_STATES) == p["prompt_abnormal"]
    assert list(TEMPLATES) == p["prompt_templates"]
    # composed sentences in the reference's exact order
    # (forward_utils.py:147-152: states outer, templates inner)
    normal, abnormal = build_prompts("dark bottle")
    want_normal = [t.format(s.format("dark bottle"))
                   for s in p["prompt_normal"] for t in p["prompt_templates"]]
    want_abnormal = [t.format(s.format("dark bottle"))
                     for s in p["prompt_abnormal"] for t in p["prompt_templates"]]
    assert normal == want_normal
    assert abnormal == want_abnormal
