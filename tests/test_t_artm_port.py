"""Reference python/tests/artm/test_t_artm.py (transaction ARTM over the
reference's own vw_transaction_data_extended.txt) with the import line
changed plus two documented PORT edits (data path constant; theta
columns read by title and mapped back to the reference's 0-based line
ids, since our VW parser keys documents by title hash instead of file
line number). The pinned p(x|d) attractor values are the reference's.
"""

import shutil
import glob
import tempfile
import os
import pytest

from six.moves import range

import bigartm_spark as artm

def test_func():
    def generate_ground_truth():
        doc_to_transactions = {}
        for i in range(num_docs):
            doc_to_transactions[i] = []

        doc_to_transactions[0].append([('class_1', 'token_1')])
        doc_to_transactions[0].append([('class_1', 'token_1'), ('class_2', 'token_2')])

        doc_to_transactions[1].append([('class_1', 'token_2')])
        doc_to_transactions[1].append([('class_1', 'token_2' ), ('class_2', 'token_3')])

        doc_to_transactions[2].append([('class_1', 'token_3')])
        doc_to_transactions[2].append([('class_1', 'token_3'), ('class_2', 'token_4')])

        doc_to_transactions[3].append([('class_1', 'token_1')])
        doc_to_transactions[3].append([('class_1', 'token_1'), ('class_2', 'token_2')])

        doc_to_transactions[4].append([('class_1', 'token_2')])
        doc_to_transactions[4].append([('class_1', 'token_2'), ('class_2', 'token_3')])

        doc_to_transactions[5].append([('class_1', 'token_3')])
        doc_to_transactions[5].append([('class_1', 'token_3'), ('class_2', 'token_4')])
  
        doc_to_transactions[6].append([('class_3', 'token_5')])
        doc_to_transactions[6].append([('class_4', 'token_5'), ('class_2', 'token_2'), ('class_1', 'token_2')])

        doc_to_transactions[7].append([('class_1', 'token_1'), ('class_2', 'token_2')])
        doc_to_transactions[7].append([('class_1', 'token_2'), ('class_2', 'token_3')])
        doc_to_transactions[7].append([('class_1', 'token_1')])

        return doc_to_transactions


    # PORT: the reference reads BIGARTM_UNITTEST_DATA; the same VW file
    # ships read-only in the reference checkout
    data_path = os.environ.get('BIGARTM_UNITTEST_DATA',
                               '/root/reference/test_data')
    batches_folder = tempfile.mkdtemp()

    num_topics = 3
    num_docs = 8
    num_tokens = 8

    try:
        bv = artm.BatchVectorizer(data_path=os.path.join(data_path,
                                  'vw_transaction_data_extended.txt'),
                                  data_format='vowpal_wabbit',
                                  target_folder=batches_folder)

        model = artm.ARTM(num_topics=num_topics,
                          cache_theta=True,
                          # PORT: the reference VW parser keys items by
                          # file line number; ours keys by title hash
                          # (scale-stable), so read theta by title and
                          # map docN -> N-1 below
                          theta_columns_naming='title',
                          class_ids={'class_1': 1.0, 'class_2': 1.0, 'class_3': 1.0, 'class_4': 1.0},
                          transaction_typenames={'@default_transaction': 1.0, 'trans1': 1.0, 'trans2': 1.0},
                          dictionary=bv.dictionary)
        model.scores.add(artm.PerplexityScore(name='PerplexityScore', dictionary=bv.dictionary))

        doc_to_transactions = generate_ground_truth()

        num_iters = 5
        model.fit_offline(bv, num_collection_passes=num_iters)
        values = model.score_tracker['PerplexityScore'].value + [-1.0]
        for i in range(num_iters - 1):
            assert values[i] > values[i + 1]

        phi = model.get_phi()
        theta = model.get_theta()
        # PORT: titles doc1..doc8 -> the reference's 0-based line ids
        theta.columns = [int(str(c)[3:]) - 1 for c in theta.columns]
        theta = theta[sorted(theta.columns)]

        assert len(phi.columns) == num_topics
        assert len(phi.index) == num_tokens
        assert len(theta.index) == num_topics
        assert len(theta.columns) == num_docs

        for i_d, d in enumerate(theta.columns):
            transactions = doc_to_transactions[d]
            for i_x, x in enumerate(transactions):
                p_xd = 0.0
                for t in phi.columns:
                    val = theta[d][t]
                    for tok in x:
                        val *= phi[t][tok]
                    p_xd += val

                if (i_d == 1 and i_x == 0) or (i_d == 4 and i_x == 0) or (i_d == 6 and i_x == 0):
                    assert abs(p_xd - 1.0) < 0.01
                elif i_d == 0 or i_d == 2 or i_d == 3 or i_d == 5:
                    assert abs(p_xd - 1.0) < 0.01
                elif (i_d == 1 and i_x == 1) or (i_d == 4 and i_x == 1):
                    assert abs(p_xd - 0.75) < 0.01
                elif (i_d == 6 and i_x == 1) or (i_d == 7 and i_x == 1):
                    assert abs(p_xd - 0.250) < 0.01
                elif (i_d == 7 and i_x == 0) or (i_d == 7 and i_x == 2):
                    assert abs(p_xd - 0.67) < 0.01
                else:
                    raise RuntimeError("Invalid i_x or i_d: {}, {}".format(i_x, i_d))

    finally:
        shutil.rmtree(batches_folder)

