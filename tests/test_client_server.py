"""Distributed RPC serving layer (utils/rpc.py + utils/client_server.py).

Validation stance mirrors the reference's: RPC client + servers run on
localhost and the merged result must equal a single-index search
(contrib/client_server.py; SURVEY.md §4 localhost-distribution).
"""

import pickle

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlatL2, IndexFlatIP
from tpu_ann.models.idmap import IndexIDMap
from tpu_ann.models.ivf import IndexIVFFlat
from tpu_ann.ops.distances import METRIC_INNER_PRODUCT
from tpu_ann.utils import rpc
from tpu_ann.utils.client_server import ClientIndex, SearchServer


def _serve(index):
    srv = rpc.Server(SearchServer(index))
    srv.serve_in_background()
    return srv


def _sharded_client(xb, make_index, nshard=2, similarity=False):
    """Split xb into id-contiguous shards, serve each, connect a client."""
    servers = []
    n = xb.shape[0]
    bounds = np.linspace(0, n, nshard + 1).astype(int)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        sub = IndexIDMap(make_index())
        sub.add_with_ids(xb[lo:hi], np.arange(lo, hi, dtype=np.int64))
        servers.append(_serve(sub))
    client = ClientIndex([("127.0.0.1", s.port) for s in servers],
                         similarity=similarity)
    return client, servers


@pytest.fixture(scope="module")
def data():
    r = np.random.RandomState(1234)
    xb = r.randn(2000, 32).astype(np.float32)
    xq = r.randn(50, 32).astype(np.float32)
    return xb, xq


def test_client_matches_single_index(data):
    xb, xq = data
    client, servers = _sharded_client(xb, lambda: IndexFlatL2(32))
    try:
        assert client.ntotal == 2000
        ref = IndexFlatL2(32)
        ref.add(xb)
        Dr, Ir = ref.search(xq, 10)
        Dc, Ic = client.search(xq, 10)
        np.testing.assert_array_equal(np.asarray(Ir), Ic)
        np.testing.assert_allclose(np.asarray(Dr), Dc, rtol=1e-5,
                                   atol=1e-4)
    finally:
        client.close()
        for s in servers:
            s.shutdown()


def test_client_inner_product_merge(data):
    xb, xq = data
    client, servers = _sharded_client(
        xb, lambda: IndexFlatIP(32), nshard=3, similarity=True)
    try:
        ref = IndexFlatIP(32)
        ref.add(xb)
        Dr, Ir = ref.search(xq, 5)
        Dc, Ic = client.search(xq, 5)
        np.testing.assert_array_equal(np.asarray(Ir), Ic)
        np.testing.assert_allclose(np.asarray(Dr), Dc, rtol=1e-5,
                                   atol=1e-4)
    finally:
        client.close()
        for s in servers:
            s.shutdown()


def test_remote_nprobe_and_exception(data):
    xb, xq = data
    ivf = IndexIVFFlat(IndexFlatL2(32), 32, nlist=16)
    ivf.train(xb)
    ivf.add(xb)
    srv = _serve(ivf)
    client = ClientIndex([("127.0.0.1", srv.port)])
    try:
        client.set_nprobe(16)  # exact within each shard at nlist=16
        ref = IndexFlatL2(32)
        ref.add(xb)
        _, Ir = ref.search(xq, 1)
        _, Ic = client.search(xq, 1)
        agree = (np.asarray(Ir)[:, 0] == Ic[:, 0]).mean()
        assert agree == 1.0

        # remote exceptions surface as ServerException with a traceback
        c = client.sub_indexes[0]
        with pytest.raises(rpc.ServerException, match="remote traceback"):
            c.call("search", "not-an-array", 3)
    finally:
        client.close()
        srv.shutdown()


def test_restricted_unpickler_refuses_classes():
    payload = pickle.dumps(rpc.Server)  # a non-allowlisted global
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        rpc._loads(payload)
    # numpy arrays and scalars round-trip
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    obj = rpc._loads(pickle.dumps(("ok", {"a": arr, "b": 3.5})))
    np.testing.assert_array_equal(obj[1]["a"], arr)


def test_distributed_kmeans_over_rpc():
    """Distributed k-means, reference style (contrib/clustering.py
    DatasetAssign servers + distributed_kmeans client, validated on
    localhost like benchs/distributed_ondisk 'Local tests'): each rpc
    server owns a slice of the training set; the client's only data
    access is the DatasetAssign protocol, fanned out by
    DatasetAssignDispatch. Must match the single-process trajectory."""
    from tpu_ann.utils.contrib import (DatasetAssign, DatasetAssignDispatch,
                                       kmeans_assign)

    rs = np.random.RandomState(11)
    xt = rs.randn(3000, 24).astype(np.float32)
    parts = np.array_split(xt, 3)

    servers, clients = [], []
    try:
        for p in parts:
            srv = rpc.Server(DatasetAssign(p), port=0)
            srv.serve_in_background()
            servers.append(srv)
            clients.append(rpc.Client("127.0.0.1", srv.port))
        # rpc.Client proxies count/dim/get_subset/assign_to transparently
        disp = DatasetAssignDispatch(clients)
        assert disp.count() == 3000 and disp.dim() == 24
        c_rpc = kmeans_assign(12, disp, niter=5, seed=3)
        c_loc = kmeans_assign(12, DatasetAssign(xt), niter=5, seed=3)
        np.testing.assert_allclose(c_rpc, c_loc, atol=1e-3)
    finally:
        for c in clients:
            c.close()
        for s in servers:
            s.shutdown()
