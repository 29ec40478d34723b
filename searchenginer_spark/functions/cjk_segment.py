"""Pure-Python dictionary CJK segmentation — max-probability DAG route.

The reference vendors cppjieba and segments Chinese with a dict-trie word
DAG + per-route max probability (MPSegment,
/root/reference/include/cppjieba/MPSegment.hpp:55-120; MixSegment adds an
HMM pass for OOV runs, MixSegment.hpp:46-86). The algorithm is public and
well documented (jieba's max-probability route): over a sentence ``s``,
every dictionary word starting at position ``i`` contributes an edge
``i -> j+1``; unigram log-probabilities ``log(freq/total)`` weight the
edges; the best segmentation is the max-sum path, found by one
right-to-left DP pass:

    route[n] = 0
    route[i] = max over edges (i, j):  logp(s[i:j+1]) + route[j+1]

This module is an ORIGINAL implementation of that public algorithm — no
code or data is copied from cppjieba/jieba. :class:`MixSegmenter` adds
the reference's OOV pass (MixSegment.hpp:46-86 composition: runs of
consecutive single-char MP pieces that do not themselves form a
dictionary word are re-segmented by a BEMS hidden-Markov Viterbi decode,
HMMSegment.hpp): the HMM here is likewise original — its emission,
transition, and start tables are DERIVED deterministically from the
word/frequency dictionary itself (B/M/E/S positional char counts,
word-length mass for transitions, Laplace smoothing) rather than copied
from any trained model, so OOV behavior is reproducible from the same
single input every deployment already supplies. 'jieba' remains the
plug-in parity tokenizer where installable, and the JVM bigram fallback
needs no dictionary at all.

The bundled :data:`DEFAULT_DICT` is likewise original: a small
hand-written word/frequency table (common Chinese vocabulary around this
engine's domain — search, indexing, computing — plus high-frequency
function words) sufficient to exercise real dictionary segmentation
in-sandbox. Real deployments pass their own (word, freq) table, e.g. the
term_dict of a previous build or any public frequency list.

Scale shape: the dictionary ships to executors inside the Arrow UDF
closure (a few KB here; a production dictionary of ~350k words is a few
MB — still closure/broadcast territory, the same shape the reference
uses where every worker holds the full trie in memory).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf

#: original mini word/frequency table (relative weights, not counts from
#: any corpus): function words high, domain nouns mid, compounds present
#: so the DP must actually choose between overlapping decompositions
#: (e.g. 机器学习 vs 机器+学习, 自然语言 vs 自然+语言).
DEFAULT_DICT: dict[str, int] = {
    # function / high-frequency words
    "我们": 5000, "你们": 2000, "他们": 2500, "这个": 3000, "那个": 1500,
    "一个": 4000, "可以": 4500, "使用": 3500, "支持": 1800, "提供": 1600,
    "实现": 1700, "需要": 2600, "通过": 2200, "进行": 2400, "没有": 2800,
    "现在": 1900, "时候": 1700, "知道": 1500, "工作": 2100, "问题": 2300,
    # domain: search / indexing / data
    "数据": 3200, "数据库": 1400, "搜索": 2600, "搜索引擎": 1200,
    "引擎": 1500, "索引": 1800, "倒排": 600, "倒排索引": 500,
    "查询": 2000, "文档": 1700, "文本": 1300, "内容": 1600, "结果": 1900,
    "分词": 900, "词典": 800, "字典": 700, "词语": 600, "语言": 1800,
    "中文": 1400, "英文": 900, "字符": 800, "字符串": 700,
    "信息": 2200, "检索": 1100, "信息检索": 800, "排序": 900, "匹配": 850,
    "频率": 700, "统计": 1000, "分析": 1500, "处理": 1600, "自然": 1200,
    "自然语言": 900, "自然语言处理": 600,
    # domain: computing / systems
    "计算": 1600, "计算机": 1300, "机器": 1400, "学习": 1900,
    "机器学习": 1000, "模型": 1300, "算法": 1500, "程序": 1400,
    "代码": 1200, "函数": 1000, "变量": 700, "系统": 2000, "网络": 1600,
    "服务": 1500, "服务器": 1000, "集群": 700, "节点": 750, "任务": 1300,
    "并行": 650, "分布": 800, "分布式": 700, "内存": 900, "存储": 950,
    "压缩": 600, "编码": 750, "解码": 550, "哈希": 500, "向量": 800,
    "相似": 700, "相似度": 550, "性能": 1100, "测试": 1200, "构建": 800,
    "合并": 700, "快速": 900, "高效": 650, "时间": 2100, "空间": 1300,
    "用户": 1800, "页面": 900, "网页": 1000, "列表": 800, "表格": 600,
    # general nouns that compose with the above in test sentences
    "中国": 2400, "北京": 1500, "大学": 1700, "研究": 1800, "开发": 1400,
    "工程": 1100, "工程师": 800, "公司": 1900, "世界": 1600, "今天": 1700,
}

_CJK_RUN = re.compile(r"[一-鿿]+")
_MIXED_RUN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[一-鿿]+")


class MPSegmenter:
    """Max-probability DAG segmenter over a word->frequency dictionary.

    One instance per process; :meth:`cut_cjk` segments a pure-CJK run,
    :meth:`cut` handles mixed text (identifier runs pass through
    lowercased, like functions.tokenize.cjk_tokens' run split).
    """

    def __init__(self, word_freq: dict[str, int] | None = None):
        self.freq = dict(word_freq or DEFAULT_DICT)
        total = sum(self.freq.values()) or 1
        self._logtotal = math.log(total)
        self._logp = {w: math.log(f) - self._logtotal for w, f in self.freq.items()}
        #: floor for OOV single characters: one pseudo-occurrence
        self._floor = -self._logtotal
        self._maxlen = max((len(w) for w in self.freq), default=1)

    def cut_cjk(self, run: str) -> list[str]:
        """Segment one contiguous CJK run by the max-probability route."""
        n = len(run)
        if n == 0:
            return []
        logp, floor, maxlen = self._logp, self._floor, self._maxlen
        # route[i] = (best log-prob of s[i:], end index j of the first word)
        route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
        for i in range(n - 1, -1, -1):
            best = (logp.get(run[i], floor) + route[i + 1][0], i + 1)
            for j in range(i + 2, min(i + maxlen, n) + 1):
                p = logp.get(run[i:j])
                if p is not None:
                    cand = (p + route[j][0], j)
                    if cand > best:  # ties break toward the LONGER word
                        best = cand
            route[i] = best
        out = []
        i = 0
        while i < n:
            j = route[i][1]
            out.append(run[i:j])
            i = j
        return out

    def cut(self, text: str) -> list[str]:
        """Mixed text -> tokens: identifier runs lowercased as single
        tokens, CJK runs dictionary-segmented, everything else dropped —
        the same run split as the JVM cjk_bigram tokenizer so the two CJK
        paths index identical Latin tokens."""
        out: list[str] = []
        for m in _MIXED_RUN.finditer(text):
            run = m.group(0)
            if _CJK_RUN.fullmatch(run):
                out.extend(self.cut_cjk(run))
            else:
                out.append(run.lower())
        return out


class HMMSegmenter:
    """BEMS-Viterbi segmenter for out-of-vocabulary CJK runs — the public
    HMM character-tagging formulation (states Begin/Middle/End/Single,
    structural transitions B->M|E, M->M|E, E->B|S, S->B|S; decode the
    max-probability state path, cut after every E or S).

    ORIGINAL parameter derivation (no trained tables are shipped): all
    three distributions come from the word/frequency dictionary —
      * emissions: each word of frequency f contributes f to its first
        char's B weight, last char's E weight, interior chars' M weights
        (single-char words weight S); Laplace-smoothed over the dict's
        char vocabulary, so chars seen mid-word in the dictionary pull
        OOV runs toward the same positions they occupy in known words.
      * transitions within a word: length mass (len-2 words drive B->E,
        len>=3 drive B->M / M->M / M->E).
      * cross-word transitions and start probs: the dict's multi- vs
        single-char word mass (E->B vs E->S etc.), +1 smoothed.
    Deterministic given the dict — the same reproducibility contract as
    the MP route."""

    _STATES = "BMES"
    #: predecessor states allowed by the BEMS structure
    _PREV = {"B": "ES", "M": "BM", "E": "BM", "S": "ES"}

    def __init__(self, word_freq: dict[str, int]):
        emit = {s: {} for s in self._STATES}
        trans = {s: dict.fromkeys(self._STATES, 0.0) for s in self._STATES}
        mass_multi = mass_single = 0.0
        for w, f in word_freq.items():
            if not w:
                continue
            if len(w) == 1:
                emit["S"][w] = emit["S"].get(w, 0.0) + f
                mass_single += f
                continue
            mass_multi += f
            emit["B"][w[0]] = emit["B"].get(w[0], 0.0) + f
            emit["E"][w[-1]] = emit["E"].get(w[-1], 0.0) + f
            for ch in w[1:-1]:
                emit["M"][ch] = emit["M"].get(ch, 0.0) + f
            if len(w) == 2:
                trans["B"]["E"] += f
            else:
                trans["B"]["M"] += f
                trans["M"]["M"] += f * (len(w) - 3)
                trans["M"]["E"] += f
        for s in "ES":  # word-to-word prior: what does the NEXT word look like
            trans[s]["B"] = mass_multi
            trans[s]["S"] = mass_single
        vocab = {c for d in emit.values() for c in d} | {""}
        self._nV = len(vocab)
        self._emit_logp = {}
        self._emit_floor = {}
        for s in self._STATES:
            total = sum(emit[s].values())
            denom = math.log(total + self._nV)
            self._emit_logp[s] = {
                c: math.log(w + 1.0) - denom for c, w in emit[s].items()
            }
            self._emit_floor[s] = -denom  # log(1 / (total + V))
        self._trans_logp = {}
        for s in self._STATES:
            total = sum(trans[s].values())
            allowed = "ME" if s in "BM" else "BS"
            self._trans_logp[s] = {
                t: math.log(trans[s][t] + 1.0) - math.log(total + len(allowed))
                for t in allowed
            }
        start_denom = math.log(mass_multi + mass_single + 2.0)
        self._start_logp = {
            "B": math.log(mass_multi + 1.0) - start_denom,
            "S": math.log(mass_single + 1.0) - start_denom,
        }

    def _emit(self, state: str, ch: str) -> float:
        return self._emit_logp[state].get(ch, self._emit_floor[state])

    def cut(self, run: str) -> list[str]:
        """Viterbi decode + split after E/S. ``run`` is one CJK run."""
        n = len(run)
        if n == 0:
            return []
        if n == 1:
            return [run]
        NEG = float("-inf")
        prob = {s: NEG for s in self._STATES}
        back: list[dict[str, str]] = []
        for s in "BS":
            prob[s] = self._start_logp[s] + self._emit(s, run[0])
        for ch in run[1:]:
            nxt = {}
            bp = {}
            for s in self._STATES:
                best_p, best_prev = NEG, None
                for p in self._PREV[s]:
                    if prob[p] == NEG:
                        continue
                    cand = prob[p] + self._trans_logp[p][s]
                    if cand > best_p:
                        best_p, best_prev = cand, p
                if best_prev is not None:
                    nxt[s] = best_p + self._emit(s, ch)
                    bp[s] = best_prev
                else:
                    nxt[s] = NEG
            prob = nxt
            back.append(bp)
        last = "E" if prob["E"] >= prob["S"] else "S"
        states = [last]
        for bp in reversed(back):
            states.append(bp[states[-1]])
        states.reverse()
        out: list[str] = []
        start = 0
        for i, s in enumerate(states):
            if s in "ES":
                out.append(run[start : i + 1])
                start = i + 1
        if start < n:  # decode ended mid-word (can't happen, but be safe)
            out.append(run[start:])
        return out


class MixSegmenter(MPSegmenter):
    """MP route + HMM OOV pass — the reference's default tokenizer shape
    (MixSegment.hpp:46-86 composition, original implementation): walk the
    MP output buffering consecutive single-char pieces; a buffer of >= 2
    chars that is not itself a dictionary word is re-segmented by the
    HMM, so OOV runs (names, new compounds) come out as multi-char words
    instead of isolated codepoints. In-dictionary text segments exactly
    like :class:`MPSegmenter`."""

    def __init__(self, word_freq: dict[str, int] | None = None):
        super().__init__(word_freq)
        self._hmm = HMMSegmenter(self.freq)

    def cut_cjk(self, run: str) -> list[str]:
        out: list[str] = []
        buf: list[str] = []
        for w in super().cut_cjk(run):
            if len(w) == 1:
                buf.append(w)
                continue
            self._flush(buf, out)
            buf = []
            out.append(w)
        self._flush(buf, out)
        return out

    def _flush(self, buf: list[str], out: list[str]) -> None:
        if not buf:
            return
        if len(buf) == 1:
            out.append(buf[0])
            return
        joined = "".join(buf)
        if joined in self.freq:
            # MP already rejected the whole word on probability; honor it
            out.extend(buf)
        else:
            out.extend(self._hmm.cut(joined))


def dict_cjk_tokens_pandas_udf(word_freq: dict[str, int] | None = None):
    """Arrow-vectorized dict_cjk tokenizer (factory — pandas_udf needs an
    active session). The SEGMENTER (MP log-prob map + derived-BEMS HMM
    tables, an O(dict) Python pass) rides the UDF closure to executors —
    built ONCE here, not per Arrow batch; MixSegmenter holds only plain
    dicts/floats, so it pickles cleanly. Uses the Mix (MP + HMM OOV)
    composition — the reference's default."""
    seg = MixSegmenter(dict(word_freq or DEFAULT_DICT))

    @pandas_udf("array<string>")
    def _seg(text: pd.Series) -> pd.Series:
        return text.fillna("").map(seg.cut)

    return _seg
