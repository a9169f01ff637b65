"""Auth policy + token-bucket rate limiting on both serving front-ends."""

import json
import http.client

import numpy as np
import pytest

from ocrfa_tpu.utils.ratelimit import AuthPolicy, KeyedRateLimiter, TokenBucket


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class FakePipeline:
    def submit_page(self, page):
        return page

    def finish_page(self, handle):
        return [([[0, 0], [1, 0], [1, 1], [0, 1]], "x", 0.5)]


class TestTokenBucket:
    def test_burst_then_refill(self):
        clock = FakeClock()
        b = TokenBucket(rate=1.0, burst=2.0, clock=clock)
        assert b.try_acquire() and b.try_acquire()
        assert not b.try_acquire()
        clock.t += 0.5
        assert not b.try_acquire()
        clock.t += 0.6
        assert b.try_acquire()

    def test_capacity_caps_refill(self):
        clock = FakeClock()
        b = TokenBucket(rate=10.0, burst=3.0, clock=clock)
        clock.t += 100.0
        got = sum(b.try_acquire() for _ in range(10))
        assert got == 3

    def test_rejects_bad_params(self):
        with pytest.raises(ValueError):
            TokenBucket(0, 1)
        with pytest.raises(ValueError):
            TokenBucket(1, -1)


class TestKeyedLimiter:
    def test_keys_are_independent(self):
        clock = FakeClock()
        lim = KeyedRateLimiter(rate=1.0, burst=1.0, clock=clock)
        assert lim.try_acquire("a")
        assert not lim.try_acquire("a")
        assert lim.try_acquire("b")


class TestAuthPolicy:
    def test_no_keys_no_limit_allows_all(self):
        assert AuthPolicy().check(None) is None

    def test_key_check(self):
        p = AuthPolicy(api_keys=["k1"])
        assert p.check("k1") is None
        assert p.check("nope") == "unauthenticated"
        assert p.check(None) == "unauthenticated"

    def test_bearer_parsing(self):
        assert AuthPolicy.bearer("Bearer abc") == "abc"
        assert AuthPolicy.bearer("bearer abc") == "abc"
        assert AuthPolicy.bearer("abc") == "abc"
        assert AuthPolicy.bearer(None) is None

    def test_rate_limit_per_key(self):
        clock = FakeClock()
        p = AuthPolicy(api_keys=["k1", "k2"], rate=1.0, burst=1.0, clock=clock)
        assert p.check("k1") is None
        assert p.check("k1") == "rate_limited"
        assert p.check("k2") is None
        clock.t += 1.1
        assert p.check("k1") is None


@pytest.fixture()
def http_server():
    from ocrfa_tpu.server import OCRServer

    clock = FakeClock()
    auth = AuthPolicy(api_keys=["secret"], rate=2.0, burst=2.0, clock=clock)
    with OCRServer(FakePipeline(), port=0, auth=auth) as srv:
        yield srv, clock


def _post(srv, headers):
    page = np.zeros((4, 4), np.uint8)
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    conn.request("POST", "/ocr", body=page.tobytes(),
                 headers={"X-Height": "4", "X-Width": "4", **headers})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


class TestHTTPServerAuth:
    def test_missing_key_401(self, http_server):
        srv, _ = http_server
        status, data = _post(srv, {})
        assert status == 401 and "error" in data

    def test_wrong_key_401(self, http_server):
        srv, _ = http_server
        status, _ = _post(srv, {"Authorization": "Bearer wrong"})
        assert status == 401

    def test_good_key_200_then_429(self, http_server):
        srv, clock = http_server
        hdr = {"Authorization": "Bearer secret"}
        assert _post(srv, hdr)[0] == 200
        assert _post(srv, hdr)[0] == 200
        assert _post(srv, hdr)[0] == 429
        clock.t += 1.0
        assert _post(srv, hdr)[0] == 200

    def test_x_api_key_header(self, http_server):
        srv, clock = http_server
        clock.t += 100.0
        assert _post(srv, {"X-API-Key": "secret"})[0] == 200

    def test_healthz_stays_open(self, http_server):
        srv, _ = http_server
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
        conn.close()


class TestGrpcServerAuth:
    def test_auth_and_limit(self):
        grpc = pytest.importorskip("grpc")
        from ocrfa_tpu.server_grpc import OCRClient, OCRGrpcServer

        clock = FakeClock()
        auth = AuthPolicy(api_keys=["secret"], rate=2.0, burst=2.0,
                          clock=clock)
        page = np.zeros((4, 4), np.uint8)
        with OCRGrpcServer(FakePipeline(), port=0, auth=auth) as srv:
            bad = OCRClient(f"127.0.0.1:{srv.port}", timeout=30)
            with pytest.raises(grpc.RpcError) as err:
                bad.recognize(page)
            assert err.value.code() == grpc.StatusCode.UNAUTHENTICATED
            bad.close()

            good = OCRClient(f"127.0.0.1:{srv.port}", timeout=30,
                             api_key="secret")
            assert isinstance(good.recognize(page), list)
            good.recognize(page)
            with pytest.raises(grpc.RpcError) as err:
                good.recognize(page)
            assert err.value.code() == grpc.StatusCode.RESOURCE_EXHAUSTED
            clock.t += 1.0
            assert isinstance(good.recognize(page), list)
            # health probe needs no key
            assert OCRClient(f"127.0.0.1:{srv.port}").health()["ok"]
            good.close()


class TestReviewRegressions:
    def test_token_rotation_cannot_bypass_limit(self):
        """With auth disabled the bucket keys on the caller, not on a
        client-supplied token (rotating tokens must not reset the bucket)."""
        clock = FakeClock()
        p = AuthPolicy(api_keys=None, rate=1.0, burst=2.0, clock=clock)
        assert p.check("tok-1", caller="1.2.3.4") is None
        assert p.check("tok-2", caller="1.2.3.4") is None
        assert p.check("tok-3", caller="1.2.3.4") == "rate_limited"

    def test_grpc_peer_port_stripped(self):
        """New connections (fresh ephemeral ports) share one bucket."""
        grpc = pytest.importorskip("grpc")
        from ocrfa_tpu.server_grpc import OCRClient, OCRGrpcServer

        clock = FakeClock()
        auth = AuthPolicy(rate=1.0, burst=2.0, clock=clock)
        page = np.zeros((4, 4), np.uint8)
        with OCRGrpcServer(FakePipeline(), port=0, auth=auth) as srv:
            for i in range(3):
                c = OCRClient(f"127.0.0.1:{srv.port}", timeout=30)
                if i < 2:
                    c.recognize(page)
                else:
                    with pytest.raises(grpc.RpcError) as err:
                        c.recognize(page)
                    assert (err.value.code()
                            == grpc.StatusCode.RESOURCE_EXHAUSTED)
                c.close()

    def test_partial_dims_rejected_http(self):
        import http.client

        from ocrfa_tpu.server import OCRServer

        with OCRServer(FakePipeline(), port=0) as srv:
            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=30)
            conn.request("POST", "/ocr", body=b"\x00" * 16,
                         headers={"X-Height": "4"})
            resp = conn.getresponse()
            body = json.loads(resp.read())
            conn.close()
            assert resp.status == 400 and "X-Width" in body["error"]
