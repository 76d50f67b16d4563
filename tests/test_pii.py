"""PII detection/redaction (ops/pii.py): sequential RE2 count+replace."""
import pandas as pd
import ray.data as rd

from folkscope_ray.ops.pii import pii_scrub


def test_pii_scrub_counts_and_redaction():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail bob@x.com and alice@y.org now",
            "server at 10.0.0.1 port 80, call 555-123-4567",
            "no pii here at all",
            "a@b.io from 192.168.1.254 tel 555.999.0000",
        ],
    })
    out = (pii_scrub(rd.from_pandas(df, override_num_blocks=2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_email"].tolist() == [2, 0, 0, 1]
    assert out["n_ipv4"].tolist() == [0, 1, 0, 1]
    assert out["n_phone"].tolist() == [0, 1, 0, 1]
    assert out["n_pii"].tolist() == [2, 2, 0, 3]
    assert out["redacted"].tolist() == [
        "mail <EMAIL> and <EMAIL> now",
        "server at <IP> port 80, call <PHONE>",
        "no pii here at all",
        "<EMAIL> from <IP> tel <PHONE>",
    ]
    # text column replaced by redacted; id carried through
    assert sorted(out.columns) == sorted(
        ["doc_id", "n_email", "n_ipv4", "n_phone", "n_pii", "redacted"])


def test_pii_scrub_sequential_no_double_count():
    # the ip-like span inside the email must NOT count as an IP: emails are
    # redacted before the ipv4 pass runs (dict order = application order)
    df = pd.DataFrame({"doc_id": [0], "text": ["x 1.2.3.4@dom.com y"]})
    out = pii_scrub(rd.from_pandas(df)).to_pandas()
    assert out["n_email"].tolist() == [1]
    assert out["n_ipv4"].tolist() == [0]
    assert out["redacted"].tolist() == ["x <EMAIL> y"]
