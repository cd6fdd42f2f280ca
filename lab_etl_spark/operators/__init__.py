"""Reusable distributed operators (pure DataFrame compositions).

Each operator is written for cluster scale first: bounded shuffles, broadcast
where a side is provably small, partition-local work wherever possible — and
then verified for correctness on the small scale factors.
"""
