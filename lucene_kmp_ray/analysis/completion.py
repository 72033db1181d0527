"""Japanese completion (auto-suggest) filter — kuromoji's
JapaneseCompletionFilter + KatakanaRomanizer.

[ref: analysis/kuromoji/.../ja/JapaneseCompletionFilter.kt,
      ja/completion/KatakanaRomanizer.kt,
      ja/completion/CharSequenceUtils.kt]

Each surface token is emitted as-is, followed (same position) by every
keystroke romanization of its reading — the mapping rules cover
modified-Hepburn, Kunrei and wapuro keystrokes and expand
multiplicatively through longest-match composition. QUERY mode
additionally concatenates all-kana runs and recovers IME
mid-composition splits (trailing lowercase-ASCII fragments)."""

from __future__ import annotations

from functools import lru_cache

from .japanese import JapaneseTokenizer, Token

# keystroke -> romanization variants [ref: KatakanaRomanizer.kt
# ROMAJI_MAP_DATA — public romanization-system mapping rules]
_ROMAJI_MAP_DATA = """
ア,a  イ,i  ウ,u  エ,e  オ,o  カ,ka  キ,ki  ク,ku  ケ,ke  コ,ko
キャ,kya  キュ,kyu  キョ,kyo  ガ,ga  ギ,gi  グ,gu  ゲ,ge  ゴ,go
ギャ,gya  ギュ,gyu  ギョ,gyo  サ,sa  シ,si,shi  ス,su  セ,se  ソ,so
シャ,sya,sha  シュ,syu,shu  シェ,sye,she  ショ,syo,sho  ザ,za
ジ,zi,ji  ズ,zu  ゼ,ze  ゾ,zo  ジャ,zya,ja  ジュ,zyu,ju  ジェ,zye,je
ジョ,zyo,jo  タ,ta  チ,ti,chi  ツ,tu,tsu  テ,te  ト,to
チャ,tya,cha,cya  チュ,tyu,chu,cyu  チョ,tyo,cho,cyo  ダ,da
ヂ,di,zi,ji  ヅ,du,zu  デ,de  ド,do  ヂャ,dya,zya,ja  ヂュ,dyu,zyu,ju
ヂョ,dyo,zyo,jo  ナ,na  ニ,ni  ヌ,nu  ネ,ne  ノ,no  ニャ,nya
ニュ,nyu  ニョ,nyo  ハ,ha  ヒ,hi  フ,hu,fu  ヘ,he  ホ,ho  ヒャ,hya
ヒュ,hyu  ヒョ,hyo  バ,ba  ビ,bi  ブ,bu  ベ,be  ボ,bo  ビャ,bya
ビュ,byu  ビョ,byo  パ,pa  ピ,pi  プ,pu  ペ,pe  ポ,po  ピャ,pya
ピュ,pyu  ピョ,pyo  マ,ma  ミ,mi  ム,mu  メ,me  モ,mo  ミャ,mya
ミュ,myu  ミョ,myo  ヤ,ya  ユ,yu  ヨ,yo  ラ,ra  リ,ri  ル,ru  レ,re
ロ,ro  リャ,rya  リュ,ryu  リョ,ryo  ワ,wa  ウィ,wi  ヰ,wi  ウェ,we
ヱ,we  ヲ,wo,o  ン,n,nn
クァ,kwa,kuxa  クィ,kwi,kuxi  クゥ,kwu,kuxu  クェ,kwe,kuxe
クォ,kwo,kuxo  グァ,gwa,guxa  グィ,gwi,guxi  グゥ,gwu,guxu
グェ,gwe,guxe  グォ,gwo,guxo  スァ,swa,suxa  スィ,swi,suxi
スゥ,swu,suxu  スェ,swe,suxe  スォ,swo,suxo  トァ,twa,toxa
トィ,twi,toxi  トゥ,twu,toxu  トェ,twe,toxe  トォ,two,toxo
ドァ,dwa,doxa  ドィ,dwi  ドゥ,dwu,doxu  ドェ,dwe,doxe  ドォ,dwo,doxo
ファ,hwa,fa,huxa  フィ,hwi,fi,huxi  フェ,hwe,fe,huxe
フォ,hwo,fo,huxo  ヴァ,va,vuxa  ヴィ,vi,vuxi  ヴ,vu  ヴェ,ve,vuxe
ヴォ,vo,vuxo  テァ,tha,texa  ティ,thi,texi  テェ,the,texe
テャ,tha,texya  テュ,thu,texyu  テョ,tho,texyo
フャ,fya,huxya,fuxya  フュ,fyu,huxyu,fuxyu  フョ,fyo,huxyo,fuxyo
ヴャ,vya,vuxya  ヴュ,vyu,vuxyu  ヴョ,vyo,vuxyo
ッカ,kka  ッキ,kki  ック,kku  ッケ,kke  ッコ,kko  ッキャ,kkya
ッキュ,kkyu  ッキョ,kkyo  ッガ,gga  ッギ,ggi  ッグ,ggu  ッゲ,gge
ッゴ,ggo  ッギャ,ggya  ッギュ,ggyu  ッギョ,ggyo  ッサ,ssa  ッシ,ssi
ッス,ssu  ッセ,sse  ッソ,sso  ッシャ,ssya,ssha  ッシュ,ssyu,sshu
ッショ,ssyo,ssho  ッザ,zza  ッジ,zzi,jji  ッズ,zzu  ッゼ,zze  ッゾ,zzo
ッジャ,zzya,jja  ッジュ,zzyu,jju  ッジョ,zzyo,jjo  ッタ,tta
ッチ,tti,ttsi  ッツ,ttu,ttsu  ッテ,tte  ット,tto
ッチャ,ttya,ccha,ttcha  ッチュ,ttyu,cchu,ttchu  ッチョ,ttyo,ccho,ttcho
ッダ,dda  ッヂ,ddi  ッヅ,ddu  ッデ,dde  ッド,ddo  ッヂャ,ddya
ッヂュ,ddyu  ッヂョ,ddyo  ッハ,hha  ッヒ,hhi  ッフ,hhu,ffu  ッへ,hhe
ッホ,hho  ッヒャ,hhya  ッヒュ,hhyu  ッヒョ,hhyo  ッバ,bba  ッビ,bbi
ッブ,bbu  ッベ,bbe  ッボ,bbo  ッビャ,bbya  ッビュ,bbyu  ッビョ,bbyo
ッパ,ppa  ッピ,ppi  ップ,ppu  ッペ,ppe  ッポ,ppo  ッピャ,ppya
ッピュ,ppyu  ッピョ,ppyo  ッマ,mma  ッミ,mmi  ッム,mmu  ッメ,mme
ッモ,mmo  ッミャ,mmya  ッミュ,mmyu  ッミョ,mmyo  ッヤ,yya  ッイ,yyi
ッユ,yyu  ッイェ,yye  ッヨ,yyo  ッラ,rra  ッリ,rri  ッル,rru  ッレ,rre
ッロ,rro  ッリャ,rrya  ッリュ,rryu  ッリョ,rryo  ッワ,wwa  ッウィ,wwi
ッウ,wwu  ッウェ,wwe  ッヲ,wwo
ックァ,kkwa,kkuxa  ックィ,kkwi,kkuxi  ックゥ,kkwu,kkuxu
ックェ,kkwe,kkuxe  ックォ,kkwo,kkuxo  ッグァ,ggwa,gguxa
ッグィ,ggwi,gguxi  ッグゥ,ggwu,gguxu  ッグェ,ggwe,gguxe
ッグォ,ggwo,gguxo  ッスァ,sswa,ssuxa  ッスィ,sswi,ssuxi
ッスゥ,sswu,ssuxu  ッスェ,sswe,ssuxe  ッスォ,sswo,suxo
ットァ,ttwa,ttoxa  ットィ,ttwi,ttoxi  ットゥ,ttwu,ttoxu
ットェ,ttwe,ttoxe  ットォ,ttwo,ttoxo  ッドァ,ddwa,ddoxa
ッドィ,ddwi,ddoxi  ッドゥ,ddwu,ddoxi  ッドェ,ddwe,ddoxe
ッドォ,ddwo,ddoxo  ッファ,hhwa,ffa,hhuxa,ffuxa
ッフィ,hhwi,ffi,hhuxi,ffuxi  ッフェ,hhwe,ffe,hhuxe,ffuxe
ッフォ,hhwo,ffo,hhuxo,ffuxo  ッヴァ,vva,vvuxa  ッヴィ,vvi,vvuxi
ッヴ,vvu  ッヴェ,vve,vvuxe  ッヴォ,vvo,vvuxo  ッテァ,ttha,ttexa
ッティ,tthi,ttexi  ッテェ,tthe,ttexe  ッテャ,ttha,ttexya
ッテュ,tthu,ttexyu  ッテョ,ttho,ttexyo  ッフャ,ffya,hhuxya,ffuxya
ッフュ,ffyu,hhuxyu,ffuxyu  ッフョ,ffyo,hhuxyo,ffuxyo
ッヴャ,vvya,vvuxya  ッヴュ,vvyu,vvuxyu  ッヴョ,vvyo,vvuxyo
ァ,xa  ィ,xi  ゥ,xu  ェ,xe  ォ,xo  ヵ,xka  ヶ,xke  ッ,xtu  ャ,xya
ュ,xyu  ョ,xyo
ッk,kk  ッg,gg  ッs,ss  ッz,zz  ッt,tt  ッd,dd  ッh,hh  ッb,bb
ッp,pp  ッm,mm  ッy,yy  ッr,rr  ッw,ww
ー,ー
・,・
"""


@lru_cache(maxsize=1)
def _romaji_map():
    table: dict[str, list[str]] = {}
    for entry in _ROMAJI_MAP_DATA.split():
        cols = entry.split(",")
        if len(cols) < 2:
            continue
        table[cols[0]] = [c for c in cols[1:] if c]
    max_len = max(len(k) for k in table)
    return table, max_len


def is_kana(s: str) -> bool:
    return bool(s) and all("ぁ" <= c <= "ゖ" or "゠" <= c <= "ヿ"
                           for c in s)


def to_katakana(s: str) -> str:
    return "".join(chr(ord(c) + 0x60) if "ぁ" <= c <= "ゖ" else c
                   for c in s)


def is_lowercase_alphabets(s: str) -> bool:
    return bool(s) and all("a" <= c <= "z" for c in s)


def is_katakana_or_hw_alphabets(s: str) -> bool:
    return bool(s) and all("゠" <= c <= "ヿ" or "a" <= c <= "z"
                           or "A" <= c <= "Z" for c in s)


def romanize_keystrokes(reading: str) -> list[str]:
    """All keystroke romanizations via longest-match composition
    [ref: KatakanaRomanizer.romanize]."""
    table, max_len = _romaji_map()
    outputs: list[str] = []
    pos = 0
    n = len(reading)
    while pos < n:
        match = None
        for ln in range(min(n - pos, max_len), 0, -1):
            cand = table.get(reading[pos:pos + ln])
            if cand is not None:
                match = (ln, cand)
                break
        if match is None:
            break
        ln, cands = match
        if not outputs:
            outputs = list(cands)
        elif len(cands) == 1:
            outputs = [o + cands[0] for o in outputs]
        else:
            outputs = [o + c for c in cands for o in outputs]
        pos += ln
    if pos < n:
        outputs = [o + reading[pos:] for o in outputs]
    return outputs


class CompletionToken:
    __slots__ = ("term", "is_first", "start", "end")

    def __init__(self, term, is_first, start, end):
        self.term = term
        self.is_first = is_first
        self.start = start
        self.end = end


def completion_filter(tokens: list, mode: str = "index"):
    """[ref: JapaneseCompletionFilter CompletionTokenGenerator] — each
    pending surface emits itself plus keystroke romanizations of its
    reading; QUERY mode concatenates kana runs and absorbs trailing
    lowercase-ASCII IME fragments."""
    outputs: list[CompletionToken] = []
    pdg = None  # [surface, reading, start, end]

    def generate():
        if pdg is None:
            return
        surface, reading, start, end = pdg
        outputs.append(CompletionToken(surface, True, start, end))
        if reading and is_katakana_or_hw_alphabets(reading):
            for r in romanize_keystrokes(reading):
                outputs.append(CompletionToken(r, False, start, end))

    for t in tokens:
        surface = t.surface
        reading = getattr(t, "reading", None)
        if reading is None and is_kana(surface):
            reading = to_katakana(surface)
        if pdg is not None:
            if (mode == "query" and pdg[1]
                    and not is_lowercase_alphabets(pdg[0])
                    and is_lowercase_alphabets(surface)):
                pdg[0] += surface
                pdg[1] += surface
                pdg[3] = t.end
                generate()
                pdg = None
                continue
            if (mode == "query" and is_kana(pdg[0])
                    and is_kana(surface)):
                pdg[0] += surface
                pdg[1] += reading or ""
                pdg[3] = t.end
                continue
            generate()
        pdg = [surface, reading or "", t.start, t.end]
    generate()
    return outputs


class JapaneseCompletionAnalyzer:
    """NORMAL-mode tokenizer + completion filter; callable
    text -> terms (surface + romanizations, suggest-index shape)."""

    name = "ja_completion"

    def __init__(self, mode: str = "index"):
        self.tokenizer = JapaneseTokenizer(mode="normal")
        self.mode = mode

    def __call__(self, text: str) -> list[str]:
        toks = self.tokenizer.tokenize(text)
        return [c.term for c in completion_filter(toks, self.mode)]
