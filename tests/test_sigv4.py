"""K2/K3: the stdlib SigV4 signer pinned byte-for-byte against the
worked example in the AWS Signature Version 4 documentation, plus
canonicalization edge cases and the credential chain's resolution /
expiry-cache behavior (reference sign.go:49-120, auth_*.go)."""

from __future__ import annotations

import hashlib

import pytest

from cga_logs_to_kinesis_spark.functions.credentials import (
    CachedProvider,
    ChainProvider,
    CredentialResolutionError,
    Credentials,
    InstanceMetadataProvider,
    Provider,
    StaticEnvProvider,
    default_chain,
)
from cga_logs_to_kinesis_spark.functions.sigv4 import (
    canonical_request,
    derive_signing_key,
    sign_request,
)

# The AWS documentation's complete worked example: GET
# https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08
# signed with the published example keypair at 20150830T123600Z.
_SECRET = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
_HEADERS = {
    "Host": "iam.amazonaws.com",
    "Content-Type": "application/x-www-form-urlencoded; charset=utf-8",
    "X-Amz-Date": "20150830T123600Z",
}
_QUERY = [("Action", "ListUsers"), ("Version", "2010-05-08")]


def test_canonical_request_hash_matches_aws_example():
    cr, signed = canonical_request("GET", "/", _QUERY, _HEADERS, b"")
    assert signed == "content-type;host;x-amz-date"
    assert hashlib.sha256(cr.encode()).hexdigest() == \
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"


def test_signing_key_matches_aws_example():
    key = derive_signing_key(_SECRET, "20150830", "us-east-1", "iam")
    assert key.hex() == ("c4afb1cc5771d871763a393e44b70357"
                         "1b55cc28424d1a5e86da6ed3c154a4b9")


def test_signature_and_authorization_match_aws_example():
    r = sign_request(access_key="AKIDEXAMPLE", secret_key=_SECRET,
                     region="us-east-1", service="iam", method="GET",
                     path="/", query=_QUERY, headers=_HEADERS)
    assert r.signature == ("5d672d79c15b13162d9279b0855cfba6"
                           "789a8edb4c82c400e06b5924a6f2b5d7")
    assert r.authorization == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/"
        "iam/aws4_request, SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e0"
        "6b5924a6f2b5d7")


def test_canonicalization_rules():
    """Header names lowercase + sort, values trim with internal space
    runs collapsed; query pairs sort by ENCODED name/value; spaces
    %20-encode (never '+'); payload hash changes the request."""
    cr1, _ = canonical_request(
        "get", "/", [("b", "2"), ("a", "1 1")],
        {"HOST": "h", "X-Amz-Date": "D", "My-Header": "  a   b  "}, b"")
    assert "my-header:a b\n" in cr1
    lines = cr1.split("\n")
    assert lines[0] == "GET" and lines[2] == "a=1%201&b=2"
    cr2, _ = canonical_request(
        "GET", "/", [("b", "2"), ("a", "1 1")],
        {"Host": "h", "x-amz-date": "D", "my-header": "a b"}, b"x")
    assert cr1.split("\n")[:-1] == cr2.split("\n")[:-1]
    assert cr1 != cr2                      # payload hash differs


def test_session_token_is_signed():
    r = sign_request(access_key="AK", secret_key="SK", region="r",
                     service="s", method="GET", path="/",
                     headers=dict(_HEADERS), session_token="TOK")
    assert "x-amz-security-token" in r.signed_headers
    assert "x-amz-security-token:TOK" in r.canonical_request


# -- K3: the credential chain ----------------------------------------------

def test_static_env_provider_and_chain_order():
    env = {"AWS_ACCESS_KEY_ID": "AK", "AWS_SECRET_ACCESS_KEY": "SK"}
    c = ChainProvider([StaticEnvProvider(env),
                       InstanceMetadataProvider()]).get()
    assert (c.access_key, c.secret_key, c.session_token) == \
        ("AK", "SK", None)
    # env missing -> chain falls through to the gated metadata
    # provider and reports every failure
    with pytest.raises(CredentialResolutionError) as e:
        ChainProvider([StaticEnvProvider({}),
                       InstanceMetadataProvider()]).get()
    assert "StaticEnvProvider" in str(e.value)
    assert "InstanceMetadataProvider" in str(e.value)


def test_assume_role_is_gated_not_silent():
    with pytest.raises(CredentialResolutionError) as e:
        default_chain({"AWS_ACCESS_KEY_ID": "AK",
                       "AWS_SECRET_ACCESS_KEY": "SK"},
                      role_arn="arn:aws:iam::1:role/x").get()
    assert "arn:aws:iam::1:role/x" in str(e.value)


def test_cached_provider_refreshes_inside_expiry_window():
    """The cachedmutexedwarmedup contract: serve the cached
    credentials until refresh_window before expiry, then refresh
    under the lock — pinned with an injected clock."""
    clock = {"t": 1000.0}
    calls = {"n": 0}

    class Counting(Provider):
        def get(self):
            calls["n"] += 1
            return Credentials("AK", "SK", None,
                               expiry=clock["t"] + 300)

    p = CachedProvider(Counting(), refresh_window=60,
                       clock=lambda: clock["t"])
    assert p.get().access_key == "AK" and calls["n"] == 1
    clock["t"] += 200                   # 100s left > 60s window
    p.get()
    assert calls["n"] == 1, "refreshed while comfortably valid"
    clock["t"] += 50                    # 50s left <= 60s window
    p.get()
    assert calls["n"] == 2, "did not refresh inside the window"
    # static credentials (no expiry) never refresh
    class Static(Provider):
        def get(self):
            calls["n"] += 1
            return Credentials("AK", "SK")
    p2 = CachedProvider(Static(), clock=lambda: clock["t"])
    p2.get(); clock["t"] += 10_000; p2.get()
    assert calls["n"] == 3


def test_put_records_request_wire_shape():
    """The stdlib K1 path: the signed PutRecords request carries the
    x-amz-json-1.1 target-header shape the reference's HTTP layer
    builds (kinesis.go:209-247), base64 Data, and an Authorization
    that verifies against an independent re-signing of the same
    inputs."""
    import base64
    import json

    from cga_logs_to_kinesis_spark.functions.sigv4 import sign_request
    from cga_logs_to_kinesis_spark.streaming.sink import (
        build_put_records_request,
    )

    req = build_put_records_request(
        stream="logs", page=[(b"hello", "k1"), (b"world", "k2")],
        region="us-east-1", access_key="AKIDEXAMPLE",
        secret_key=_SECRET, amz_date="20150830T123600Z")
    assert req["url"] == "https://kinesis.us-east-1.amazonaws.com/"
    h = req["headers"]
    assert h["X-Amz-Target"] == "Kinesis_20131202.PutRecords"
    assert h["Content-Type"] == "application/x-amz-json-1.1"
    body = json.loads(req["body"])
    assert body["StreamName"] == "logs"
    assert [base64.b64decode(r["Data"]) for r in body["Records"]] == \
        [b"hello", b"world"]
    assert [r["PartitionKey"] for r in body["Records"]] == ["k1", "k2"]
    # independent re-sign of the same canonical inputs must agree
    again = sign_request(
        access_key="AKIDEXAMPLE", secret_key=_SECRET,
        region="us-east-1", service="kinesis", method="POST", path="/",
        headers={k: v for k, v in h.items() if k != "Authorization"},
        payload=req["body"])
    assert h["Authorization"] == again.authorization
    assert again.signature in h["Authorization"]


def test_put_records_request_signs_session_token():
    from cga_logs_to_kinesis_spark.streaming.sink import (
        build_put_records_request,
    )

    req = build_put_records_request(
        stream="logs", page=[(b"x", "k")], region="eu-west-1",
        access_key="AK", secret_key="SK",
        amz_date="20200101T000000Z", session_token="TOK")
    assert req["headers"]["X-Amz-Security-Token"] == "TOK"
    assert "x-amz-security-token" in \
        req["headers"]["Authorization"]


# -- K3: the network providers against a local http.server fake -------------
# The fetch-and-parse bodies of auth_metadata.go:25-52 and
# auth_assumerole.go:16-23 are offline-testable: a stdlib HTTP server
# plays the metadata endpoint / STS, the STS handler independently
# RE-SIGNS the request it received and rejects a bad Authorization,
# and the expiry it returns drives CachedProvider refresh end-to-end.

import contextlib
import http.server
import threading


@contextlib.contextmanager
def _local_server(handler_cls):
    srv = http.server.HTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


class _ImdsHandler(http.server.BaseHTTPRequestHandler):
    creds_json = (b'{"AccessKeyId": "ASIAMETA", '
                  b'"SecretAccessKey": "METASECRET", '
                  b'"Token": "METATOKEN", '
                  b'"Expiration": "2026-01-01T00:00:00Z"}')

    def log_message(self, *a):          # keep pytest output clean
        pass

    def do_GET(self):
        base = "/latest/meta-data/iam/security-credentials"
        if self.path == base:
            body = b"my-instance-role\nother-role\n"
        elif self.path == f"{base}/my-instance-role":
            body = self.creds_json
        else:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_instance_metadata_two_get_dance():
    """auth_metadata.go:25-52: role listing (first line wins), then
    that role's credential JSON; Expiration lands in
    Credentials.expiry as epoch seconds."""
    from datetime import datetime, timezone

    with _local_server(_ImdsHandler) as endpoint:
        c = InstanceMetadataProvider(endpoint=endpoint).get()
    assert (c.access_key, c.secret_key, c.session_token) == \
        ("ASIAMETA", "METASECRET", "METATOKEN")
    assert c.expiry == datetime(
        2026, 1, 1, tzinfo=timezone.utc).timestamp()
    # and the CHAIN resolves through it when static env is absent
    with _local_server(_ImdsHandler) as endpoint:
        c2 = ChainProvider([
            StaticEnvProvider({}),
            InstanceMetadataProvider(endpoint=endpoint)]).get()
    assert c2.access_key == "ASIAMETA"


def test_instance_metadata_env_endpoint_and_bad_payloads():
    # the public env var wires the endpoint without code changes
    with _local_server(_ImdsHandler) as endpoint:
        c = InstanceMetadataProvider(
            env={"AWS_EC2_METADATA_SERVICE_ENDPOINT": endpoint}).get()
    assert c.secret_key == "METASECRET"

    class Empty(_ImdsHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    with _local_server(Empty) as endpoint, \
            pytest.raises(CredentialResolutionError, match="IAM role"):
        InstanceMetadataProvider(endpoint=endpoint).get()

    class NotJson(_ImdsHandler):
        creds_json = b"<html>boom</html>"

    with _local_server(NotJson) as endpoint, \
            pytest.raises(CredentialResolutionError, match="failed"):
        InstanceMetadataProvider(endpoint=endpoint).get()
    # no endpoint anywhere -> gated error, no network attempt
    with pytest.raises(CredentialResolutionError, match="falls through"):
        InstanceMetadataProvider(env={}).get()


_STS_XML = """<AssumeRoleResponse
    xmlns="https://sts.amazonaws.com/doc/2011-06-15/">
  <AssumeRoleResult>
    <Credentials>
      <AccessKeyId>ASIASTS</AccessKeyId>
      <SecretAccessKey>STSSECRET</SecretAccessKey>
      <SessionToken>STSTOKEN</SessionToken>
      <Expiration>{expiry}</Expiration>
    </Credentials>
  </AssumeRoleResult>
</AssumeRoleResponse>"""


def _sts_handler(base_creds, expiry_box, seen):
    """An STS fake that RE-SIGNS the incoming request with the known
    base credentials and rejects a mismatched Authorization — the
    strongest offline check that AssumeRoleProvider built the exact
    auth_assumerole.go:16-23 request."""
    import urllib.parse as up

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            parsed = up.urlparse(self.path)
            query = sorted(up.parse_qsl(parsed.query))
            headers = {
                "Host": self.headers["Host"],
                "X-Amz-Date": self.headers["X-Amz-Date"],
            }
            expect = sign_request(
                access_key=base_creds.access_key,
                secret_key=base_creds.secret_key,
                region="us-east-1", service="sts", method="POST",
                path=parsed.path or "/", query=query,
                headers=headers, payload=b"",
                session_token=self.headers["X-Amz-Security-Token"]
                if "X-Amz-Security-Token" in self.headers else None)
            seen.append({"query": dict(query),
                         "auth": self.headers["Authorization"]})
            if self.headers["Authorization"] != expect.authorization:
                self.send_error(403, "signature mismatch")
                return
            body = _STS_XML.format(expiry=expiry_box["v"]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def test_assume_role_signed_fetch_and_cached_refresh():
    """End-to-end through the local STS fake: the request carries the
    2011-06-15 AssumeRole query shape and a SigV4 Authorization the
    server independently re-derives; the XML expiry propagates into
    Credentials.expiry, so CachedProvider's window triggers a real
    second fetch."""
    from cga_logs_to_kinesis_spark.functions.credentials import (
        AssumeRoleProvider,
    )

    base = StaticEnvProvider({"AWS_ACCESS_KEY_ID": "AKBASE",
                              "AWS_SECRET_ACCESS_KEY": "SKBASE",
                              "AWS_SESSION_TOKEN": "BASETOK"})
    clock = {"t": 1_700_000_000.0}
    expiry_box = {"v": "2026-01-01T00:00:00Z"}
    seen: list[dict] = []
    handler = _sts_handler(base.get(), expiry_box, seen)
    with _local_server(handler) as endpoint:
        p = AssumeRoleProvider(
            base, "arn:aws:iam::1:role/x", session_name="sess",
            region="us-east-1", endpoint=endpoint,
            clock=lambda: clock["t"])
        c = p.get()
        assert (c.access_key, c.secret_key, c.session_token) == \
            ("ASIASTS", "STSSECRET", "STSTOKEN")
        from datetime import datetime, timezone
        assert c.expiry == datetime(
            2026, 1, 1, tzinfo=timezone.utc).timestamp()
        assert seen[0]["query"] == {
            "Version": "2011-06-15", "Action": "AssumeRole",
            "RoleSessionName": "sess",
            "RoleArn": "arn:aws:iam::1:role/x"}
        assert seen[0]["auth"].startswith("AWS4-HMAC-SHA256 ")

        # expiry-driven refresh through CachedProvider: jump the clock
        # to inside the refresh window -> a second signed fetch
        cached = CachedProvider(p, refresh_window=60,
                                clock=lambda: clock["t"])
        cached.get()
        n_before = len(seen)
        clock["t"] = c.expiry - 30          # inside the window
        expiry_box["v"] = "2026-06-01T00:00:00Z"
        c2 = cached.get()
        assert len(seen) == n_before + 1, "no refresh fetch happened"
        assert c2.expiry > c.expiry


def test_assume_role_rejects_bad_data():
    """auth_assumerole.go's sanity checks: empty SecretAccessKey,
    missing Credentials element, and unparseable XML all raise."""
    from cga_logs_to_kinesis_spark.functions.credentials import (
        AssumeRoleProvider,
    )

    with pytest.raises(CredentialResolutionError, match="bad data"):
        AssumeRoleProvider._parse_response(
            b"<AssumeRoleResponse><AssumeRoleResult><Credentials>"
            b"<AccessKeyId>X</AccessKeyId><SecretAccessKey/>"
            b"</Credentials></AssumeRoleResult></AssumeRoleResponse>")
    with pytest.raises(CredentialResolutionError, match="missing"):
        AssumeRoleProvider._parse_response(
            b"<AssumeRoleResponse/>")
    with pytest.raises(CredentialResolutionError, match="unparseable"):
        AssumeRoleProvider._parse_response(b"not xml at all <<<")


def test_cached_provider_serves_stale_inside_window_on_blip():
    clock = {"t": 1000.0}
    state = {"fail": False, "n": 0}

    class Flaky(Provider):
        def get(self):
            state["n"] += 1
            if state["fail"]:
                raise CredentialResolutionError("transient blip")
            return Credentials("AK", "SK", None,
                               expiry=clock["t"] + 300)

    p = CachedProvider(Flaky(), refresh_window=60,
                       clock=lambda: clock["t"])
    first = p.get()
    state["fail"] = True
    clock["t"] += 250                   # 50s left: inside the window
    assert p.get() is first, "stale-but-valid creds were not served"
    clock["t"] += 100                   # past true expiry
    with pytest.raises(CredentialResolutionError, match="blip"):
        p.get()
    state["fail"] = False               # recovery refreshes normally
    assert p.get().expiry == clock["t"] + 300
