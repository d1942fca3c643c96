"""SimpleQueryParser — the never-throws end-user parser
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java``).

Operation-for-operation port of the reference's character state machine:
``parseSubQuery`` (:164-223) / ``consumeSubQuery`` (:226-282) /
``consumePhrase`` (:284-351) / ``consumeToken`` (:354-420) /
``buildQueryTree`` (:434-470) / ``parseFuzziness`` (:474-509) /
``tokenFinished`` (:511-525). Any malformed input degrades to literal text:
an unmatched ``(`` or ``"`` is extraneous, ``--a`` double-negates, ``+``/``|``
without a left operand are ignored. Operators: ``+`` AND, ``|`` OR, ``-``
NOT, ``"..."`` phrase (``~N`` slop), trailing ``*`` prefix, ``~N`` fuzzy,
``(...)`` precedence, ``\\`` escape.
"""

from __future__ import annotations

from .query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

CONTENT_FIELD = "content"

_MUST, _SHOULD = "MUST", "SHOULD"
_WS = " \t\n\r"
_MAX_FUZZY = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "cur_op", "prev_op", "not_")

    def __init__(self, data: str, start: int, length: int):
        self.data, self.index, self.length = data, start, length
        self.top: Query | None = None
        self.cur_op: str | None = None
        self.prev_op: str | None = None
        self.not_ = 0


class SimpleParser:
    def __init__(self, analyzer=None, default_operator: str = _SHOULD):
        from ..analysis.tokenizer import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.default_operator = default_operator

    # ---- leaf builders (QueryBuilder analogs; :541-612) ----
    def _default_query(self, text: str) -> Query | None:
        from ..analysis.tokenizer import analyze_with_positions

        analyzed = analyze_with_positions(text, self.analyzer)
        if not analyzed:
            return None
        if len(analyzed) == 1:
            return TermQuery(analyzed[0][0], field=CONTENT_FIELD)
        # one input word analyzed into several terms → createBooleanQuery
        return BooleanQuery(
            should=[TermQuery(t, field=CONTENT_FIELD) for t, _ in analyzed]
        )

    def _fuzzy_query(self, text: str, fuzziness: int) -> Query | None:
        from ..analysis.tokenizer import analyze_with_positions

        analyzed = analyze_with_positions(text, self.analyzer)
        if not analyzed:
            return None
        return FuzzyQuery(analyzed[0][0], max_edits=fuzziness, field=CONTENT_FIELD)

    def _phrase_query(self, text: str, slop: int) -> Query | None:
        from ..analysis.tokenizer import analyze_with_positions

        analyzed = analyze_with_positions(text, self.analyzer)
        if not analyzed:
            return None
        if len(analyzed) == 1:
            return TermQuery(analyzed[0][0], field=CONTENT_FIELD)
        base = analyzed[0][1]
        return PhraseQuery(
            terms=tuple(t for t, _ in analyzed),
            rel_positions=tuple(p - base for _, p in analyzed),
            field=CONTENT_FIELD,
            slop=slop,
        )

    def _prefix_query(self, text: str) -> Query | None:
        if not text:
            return None
        return PrefixQuery(text.lower(), field=CONTENT_FIELD)

    # ---- the state machine ----
    def parse(self, query_text: str) -> Query:
        state = _State(query_text, 0, len(query_text))
        self._parse_sub(state)
        if state.top is None:
            return BooleanQuery()  # MatchNoDocsQuery (:158)
        return state.top

    def _parse_sub(self, state: _State) -> None:
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(":
                self._consume_sub(state)
            elif c == ")":
                state.index += 1  # extraneous, ignored
            elif c == '"':
                self._consume_phrase(state)
            elif c == "+":
                if state.cur_op is None and state.top is not None:
                    state.cur_op = _MUST
                state.index += 1
            elif c == "|":
                if state.cur_op is None and state.top is not None:
                    state.cur_op = _SHOULD
                state.index += 1
            elif c == "-":
                state.not_ += 1
                state.index += 1
                continue  # keep the not count across the next char decision
            elif c in _WS:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    def _consume_sub(self, state: _State) -> None:
        start = state.index = state.index + 1
        precedence, escaped = 1, False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\":
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing paren: '(' is extraneous
        elif state.index == start:
            state.cur_op = None  # '()' empty group
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub(sub)
            self._build_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        start = state.index = state.index + 1
        copied: list[str] = []
        escaped = has_slop = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\":
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            copied.append(c)
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing quote: '"' is extraneous
        elif state.index == start:
            state.cur_op = None  # empty phrase
            state.index += 1
        else:
            text = "".join(copied)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_tree(state, self._phrase_query(text, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        copied: list[str] = []
        escaped = prefix = fuzzy = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\":
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if copied and c == "~":
                    fuzzy = True
                    break
                prefix = bool(copied) and c == "*"
            escaped = False
            copied.append(c)
            state.index += 1
        if copied:
            if fuzzy:
                fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZY)
                token = "".join(copied)
                branch = (self._default_query(token) if fuzziness == 0
                          else self._fuzzy_query(token, fuzziness))
            elif prefix:
                branch = self._prefix_query("".join(copied[:-1]))
            else:
                branch = self._default_query("".join(copied))
            self._build_tree(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        if state.index < state.length and state.data[state.index] == "~":
            digits: list[str] = []
            while state.index < state.length:
                state.index += 1
                if state.index < state.length:
                    if self._token_finished(state):
                        break
                    digits.append(state.data[state.index])
            text = "".join(digits)
            if text == "":
                return 2  # automatic fuzziness (:496)
            try:
                return max(int(text), 0)
            except ValueError:
                return 0
        return 0

    @staticmethod
    def _token_finished(state: _State) -> bool:
        return state.data[state.index] in '"|+()' or state.data[state.index] in _WS

    def _build_tree(self, state: _State, branch: Query | None) -> None:
        if branch is None:
            return
        if state.not_ % 2 == 1:
            # negation wraps as (MUST_NOT branch, SHOULD MatchAll) (:445-449)
            branch = BooleanQuery(should=[MatchAllQuery()], must_not=[branch])
        if state.top is None:
            state.top = branch
            return
        if state.cur_op is None:
            state.cur_op = self.default_operator
        if state.prev_op != state.cur_op:
            # operational change: previous tree becomes one clause of a new
            # parent (preserves left-to-right precedence, :458-462)
            wrapped = BooleanQuery()
            (wrapped.must if state.cur_op == _MUST else wrapped.should).append(state.top)
            state.top = wrapped
        assert isinstance(state.top, BooleanQuery)
        (state.top.must if state.cur_op == _MUST else state.top.should).append(branch)
        state.prev_op, state.cur_op = state.cur_op, None


def parse_simple(s: str, analyzer=None, default_operator: str = "SHOULD") -> Query:
    """Parse with SimpleQueryParser semantics; never raises on user input."""
    return SimpleParser(analyzer, default_operator).parse(s)
