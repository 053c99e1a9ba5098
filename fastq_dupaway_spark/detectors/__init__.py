"""Detector stages. Each detector turns the transcripts table into either

- a cluster assignment (conv_id, rep_conv_id) directly (exact), or
- a candidate/verified duplicate-pair edge list (conv_a, conv_b) feeding
  connected-components clustering (simhash, minhash, containment).

Reference analogs per detector are cited in each module.
"""
