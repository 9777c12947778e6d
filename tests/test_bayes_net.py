import numpy as np
import pytest

from tensornetworks_tpu.core import (
    BayesianNetwork,
    calculate_tvd,
    get_random_chain_network,
    get_sprinkler_network,
)

# Exact Sprinkler oracle (SURVEY.md §3.4 / BASELINE.md), derived analytically
# from the CPTs at reference bayesian_network.py:358-381.
SPRINKLER_POSTERIOR = {
    (0, 0, 0): 0.2 * 0.5 * 0.5 * 0.8 * 0.01 / 0.1 / 0.65,  # computed below instead
}


def exact_sprinkler_posterior():
    # Independent recomputation of P(C,S,R | W=1) by brute force chain rule.
    pC = {0: 0.5, 1: 0.5}
    pS = {0: {0: 0.5, 1: 0.5}, 1: {0: 0.9, 1: 0.1}}
    pR = {0: {0: 0.8, 1: 0.2}, 1: {0: 0.2, 1: 0.8}}
    pW = {(0, 0): 0.01, (0, 1): 0.9, (1, 0): 0.9, (1, 1): 0.99}
    joint = {}
    for c in (0, 1):
        for s in (0, 1):
            for r in (0, 1):
                joint[(c, s, r)] = pC[c] * pS[c][s] * pR[c][r] * pW[(s, r)]
    z = sum(joint.values())
    return {k: v / z for k, v in joint.items()}, z


def test_sprinkler_posterior_oracle():
    bn = get_sprinkler_network()
    post, p_obs = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    expected, z = exact_sprinkler_posterior()
    assert abs(p_obs - 0.65) < 1e-12
    assert abs(p_obs - z) < 1e-12
    for k, v in expected.items():
        assert abs(post[k] - v) < 1e-12
    # Spot values from BASELINE.md.
    assert abs(post[(1, 0, 1)] - 0.498462) < 1e-6
    assert abs(post[(0, 1, 0)] - 0.276923) < 1e-6
    assert abs(post[(0, 0, 0)] - 0.003077) < 1e-6


def test_posterior_vector_matches_dict():
    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    vec = bn.posterior_vector(["C", "S", "R"], {"W": 1})
    assert calculate_tvd(post, {k: vec[i] for i, k in enumerate(sorted(post))}) < 1e-12
    assert abs(vec.sum() - 1.0) < 1e-12


def test_joint_probability_matches_chain_rule():
    bn = get_sprinkler_network()
    # P(C=1,S=0,R=1,W=1) = 0.5 * 0.9 * 0.8 * 0.9
    assert abs(bn.get_joint_probability((1, 0, 1, 1)) - 0.5 * 0.9 * 0.8 * 0.9) < 1e-15
    assert abs(bn.joint_table().sum() - 1.0) < 1e-12


def test_prior_distribution():
    bn = get_sprinkler_network()
    prior = bn.get_prior_distribution(["C", "S", "R"])
    assert abs(sum(prior.values()) - 1.0) < 1e-12
    # P(C=1,S=0,R=1) = 0.5 * 0.9 * 0.8
    assert abs(prior[(1, 0, 1)] - 0.36) < 1e-12
    # Marginal of single var with reordering: P(R=1) = 0.5*0.2 + 0.5*0.8
    pr = bn.get_prior_distribution(["R"])
    assert abs(pr[(1,)] - 0.5) < 1e-12


def test_marginal_order_permutation():
    bn = get_sprinkler_network()
    csr = bn.marginal_table(["C", "S", "R"])
    rsc = bn.marginal_table(["R", "S", "C"])
    # (c,s,r) index in csr must equal (r,s,c) index in rsc.
    for c in (0, 1):
        for s in (0, 1):
            for r in (0, 1):
                assert abs(csr[c * 4 + s * 2 + r] - rsc[r * 4 + s * 2 + c]) < 1e-15


def test_conditional_joint_marginalizes_others():
    # Query a subset so that 'other' variables must be marginalized
    # (reference bayesian_network.py:209-232 branch).
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["S", "R"], {"W": 1})  # marginalizes C
    post, p_obs = bn.get_true_posterior(["S", "R"], {"W": 1})
    assert abs(t.sum() - 0.65) < 1e-12
    for i, k in enumerate(sorted(post)):
        assert abs(t[i] / 0.65 - post[k]) < 1e-12


def test_callable_cpt():
    bn = BayesianNetwork()
    bn.add_node("A", cpt=lambda parents: {0: 0.7, 1: 0.3})
    bn.add_node("B", cpt=lambda pv: {0: 0.9 if pv[0] == 0 else 0.2, 1: 0.1 if pv[0] == 0 else 0.8},
                parent_names=["A"])
    # P(A=1 | B=1) = 0.3*0.8 / (0.3*0.8 + 0.7*0.1)
    post, p_obs = bn.get_true_posterior(["A"], {"B": 1})
    assert abs(p_obs - 0.31) < 1e-12
    assert abs(post[(1,)] - 0.24 / 0.31) < 1e-12


def test_add_node_validation():
    bn = BayesianNetwork()
    bn.add_node("A", cpt={(): {0: 0.5, 1: 0.5}})
    with pytest.raises(ValueError):
        bn.add_node("A", cpt={(): {0: 0.5, 1: 0.5}})
    with pytest.raises(ValueError):
        bn.add_node("B", cpt={(0,): {0: 1, 1: 0}, (1,): {0: 1, 1: 0}}, parent_names=["Z"])
    with pytest.raises(ValueError):
        bn.add_node("C", cpt={(): {0: 0.6, 1: 0.6}})  # doesn't sum to 1


def test_forward_sampling_statistics():
    bn = get_sprinkler_network()
    dicts, tuples = bn.sample_forward(20000, seed=0)
    assert len(dicts) == len(tuples) == 20000
    emp = np.zeros(16)
    for t in tuples:
        idx = t[0] * 8 + t[1] * 4 + t[2] * 2 + t[3]
        emp[idx] += 1
    emp /= emp.sum()
    assert calculate_tvd(emp, bn.joint_table()) < 0.02


def test_zero_evidence_posterior():
    bn = BayesianNetwork()
    bn.add_node("A", cpt={(): {0: 1.0, 1: 0.0}})
    bn.add_node("B", cpt={(0,): {0: 1.0, 1: 0.0}, (1,): {0: 0.0, 1: 1.0}}, parent_names=["A"])
    post, p_obs = bn.get_true_posterior(["A"], {"B": 1})
    assert p_obs == 0.0
    assert all(v == 0.0 for v in post.values())


def test_random_chain_network_valid():
    bn = get_random_chain_network(8, seed=3)
    assert bn.num_nodes == 8
    assert abs(bn.joint_table().sum() - 1.0) < 1e-10
    post, p_obs = bn.get_true_posterior([f"V{i}" for i in range(7)], {"V7": 1})
    assert abs(sum(post.values()) - 1.0) < 1e-9


def test_tvd_oracle():
    # utils.py:96-102 oracle: documented pairs give TVD 0.3.
    p1 = {"00": 0.25, "01": 0.25, "10": 0.25, "11": 0.25}
    p2 = {"00": 0.5, "01": 0.1, "10": 0.1, "11": 0.3}
    assert abs(calculate_tvd(p1, p2) - 0.3) < 1e-12
    assert abs(calculate_tvd(np.array([0.25] * 4), np.array([0.5, 0.1, 0.1, 0.3])) - 0.3) < 1e-12


def test_likelihood_weighted_marginals_match_exact():
    """LW marginal estimates converge to the exact enumerated posterior
    marginals (the n >= 25 quality surrogate, validated where enumeration
    still works)."""
    import numpy as np

    from tensornetworks_tpu.core import get_random_chain_network

    n = 10
    bn = get_random_chain_network(n + 1, seed=4)
    latent = [f"V{i}" for i in range(n)]
    obs = {f"V{n}": 1}
    post = bn.posterior_vector(latent, obs)
    # Exact P(z_i = 1 | x) from the dense posterior.
    p = post.reshape((2,) * n)
    exact = {latent[i]: float(p.sum(axis=tuple(j for j in range(n) if j != i))[1])
             for i in range(n)}
    est = bn.likelihood_weighted_marginals(latent, obs, num_samples=200_000,
                                           seed=0)
    ess = est.pop("__ess__")
    assert ess > 10_000
    for nm in latent:
        assert abs(est[nm] - exact[nm]) < 0.01, (nm, est[nm], exact[nm])
