"""Assamese / Gujarati / Kannada / Malayalam / Marathi / Odia /
Punjabi / Sinhala analysis chains.

Reference chains (``/root/reference/analysis/extra/.../{as,gu,kn,ml,mr,or,pa,si}/``):
StandardTokenizer → LowerCase → DecimalDigit → IndicNormalization →
<Lang>Normalization → Stop → <Lang>StemFilter.

The shared IndicNormalizationFilter is the repo's existing
``analysis.indic.indic_normalize`` (script-flagged compose table).
The per-language normalizers are left-to-right scans: script dandas →
generic dandas, a ``:`` following a same-script char → that script's
visarga (tokens can only carry SINGLE colons — the tokenizer's
MidLetter grammar — so the SQL mirror's one-pass regex is exact),
ZWJ/ZWNJ deletes, Assamese ৰ-form, Punjabi bindi/adak folds and
virama delete, and Marathi's fold table (न+् → ं, nukta/virama
deletes, chandrabindu → anusvara, vowel shortening).

The stemmers strip ONE suffix (first match in file order, stem ≥ 2):
Punjabi rules may cut a different length than they match and append a
replacement; Marathi uses Hindi-style length tiers.

SQL mirrors via ``oracle.bm25_indic_extra_topk``; vectors from the
reference's Test*Analyzer.kt suites live in
tests/test_indic_extra_analyzers.py.
"""

from __future__ import annotations

from .arabic import fold_digits
from .indic import indic_normalize
from .romance import _RomanceAnalyzer


ASSAMESE_STOP_WORDS = frozenset("""
আৰু বা অথবা এই এয়া এনে সেই সেয়া সি তেওঁ তেখেত মই আমি তুমি তোমাৰ
আপুনি আপোনাৰ ই ইয়াৰ ইয়াত তাৰ তাত তাক যে যদি যেন যেতিয়া তেতিয়া
কিন্তু তথাপি কাৰণ বাবে কাৰণে লাগি পৰা লৈ লগতে সৈতে মধ্যে ওপৰত তলত
আগতে পিছত হয় হৈ হৈছে হৈছিল নহয় নাই আছে আছিল কৰা কৰি কৰে কৰিছে
কৰিছিল কি কোন কিয় কেতিয়া কেনেকৈ কত সকলো বহু বেছি কম মাত্ৰ পুনৰ আজি
কালি এতিয়া
""".split())

GUJARATI_STOP_WORDS = frozenset("""
અંગે અંદર અથવા અને અમને અમારું અમે અહીં આ આગળ આથી આનું આને આપણને
આપણું આપણે આપી આર આવી આવે ઉપર ઉભા ઊંચે ઊભું એ એક એન એના એનાં એની
એનું એને એનો એમ એવા એવાં એવી એવું એવો ઓછું કંઈક કઈ કયું કયો કરતાં
કરવું કરી કરીએ કરું કરે કરેલું કર્યા કર્યાં કર્યું કર્યો કાંઈ કે
કેટલું કેમ કેવી કેવું કોઈ કોઈક કોણ કોણે કોને ક્યાં ક્યારે ખૂબ ગઈ ગયા
ગયાં ગયું ગયો ઘણું છ છતાં છીએ છું છે છેક છો જ જાય જી જે જેટલું જેને
જેમ જેવી જેવું જેવો જો જોઈએ જ્યાં જ્યારે ઝાઝું તને તમને તમારું તમે
તા તારાથી તારામાં તારું તું તે તેં તેઓ તેણે તેથી તેના તેની તેનું
તેને તેમ તેમનું તેમને તેવી તેવું તો ત્યાં ત્યારે થઇ થઈ થઈએ થતા થતાં
થતી થતું થતો થયા થયાં થયું થયેલું થયો થવું થાઉં થાઓ થાય થી થોડું
દરેક ન નં નં. નથી નહિ નહી નહીં ના ની નીચે નું ને નો પછી પણ પર પરંતુ
પહેલાં પાછળ પાસે પોતાનું પ્રત્યેક ફક્ત ફરી ફરીથી બંને બધા બધું બની
બહાર બહુ બાદ બે મને મા માં માટે માત્ર મારું મી મૂકવું મૂકી મૂક્યા
મૂક્યાં મૂક્યું મેં રહી રહે રહેવું રહ્યા રહ્યાં રહ્યો રીતે રૂ. રૂા
લેતા લેતું લેવા વગેરે વધુ શકે શા શું સરખું સામે સુધી હતા હતાં હતી
હતું હવે હશે હશો હા હું હો હોઈ હોઈશ હોઈશું હોય હોવા
""".split())

KANNADA_STOP_WORDS = frozenset("""
ಮತ್ತು ಅಥವಾ ಆದರೆ ಆದರೂ ಏಕೆಂದರೆ ಆದ್ದರಿಂದ ಆದಾಗ್ಯೂ ಈ ಆ ಇದು ಅದು ಇವು ಅವು
ಇಲ್ಲಿ ಅಲ್ಲಿ ಎಲ್ಲಿ ಇಂದು ನಿನ್ನೆ ನಾಳೆ ಈಗ ನಂತರ ಮೊದಲು ಮೇಲೆ ಕೆಳಗೆ ಒಳಗೆ
ಹೊರಗೆ ಮಧ್ಯೆ ನಾನು ನನ್ನ ನಾವು ನಮ್ಮ ನೀನು ನೀವು ನಿಮ್ಮ ಅವನು ಅವಳು ಅವರು ಅವರ
ಅವನ ಅವಳ ಯಾರು ಯಾವ ಯಾವುದು ಯಾವಾಗ ಏನು ಏಕೆ ಹೇಗೆ ಎಂದು ಎಂಬ ಹಾಗೂ ಕೂಡ ಸಹ
ಮಾತ್ರ ಎಲ್ಲಾ ಕೆಲವು ಒಂದು ಎರಡು ಹೆಚ್ಚು ಕಡಿಮೆ ಬಹಳ ತುಂಬಾ ಇದೆ ಇವೆ ಇದ್ದ
ಇತ್ತು ಇಲ್ಲ ಅಲ್ಲ ಆಗಿದೆ ಆಗಿ ಆಗ ಮಾಡಿ ಮಾಡಿದ ಮಾಡುತ್ತದೆ ಮಾಡಲು
""".split())

MALAYALAM_STOP_WORDS = frozenset("""
ആണ് ആകുന്നു ആയിരുന്നു ആയി ഒരു ഈ ആ ഇത് അത് ഇവ അവ അവൻ അവൾ അവർ ഞാൻ നീ
നിങ്ങൾ ഞങ്ങൾ നമ്മൾ എൻ എന്റെ നിന്റെ അവന്റെ അവളുടെ അവരുടെ ഇല്ല അല്ല
ഉണ്ട് എന്ന് എന്ന എന്നാൽ എന്നും എങ്കിൽ അല്ലെങ്കിൽ മറ്റു മറ്റ് കൂടി
മാത്രം വരെ മുതൽ കൂടെ പോലെ വേണ്ടി ശേഷം മുമ്പ് കാരണം അതുകൊണ്ട് പിന്നെ
പക്ഷേ അതിനാൽ
""".split())

MARATHI_STOP_WORDS = frozenset("""
अधिक अनेक अशी असलयाचे असलेल्या असा असून असे आज आणि आता आपल्या आला
आली आले आहे आहेत एक एका कमी करणयात करून का काम काय काही किवा की केला
केली केले कोटी गेल्या घेऊन जात झाला झाली झाले झालेल्या टा डॉ तर तरी
तसेच ता ती तीन ते तो त्या त्याचा त्याची त्याच्या त्याना त्यानी
त्यामुळे त्री दिली दोन न नाही निर्ण्य पण पम परयतन पाटील म मात्र
माहिती मी मुबी म्हणजे म्हणाले म्हणून या याचा याची याच्या याना यानी
येणार येत येथील येथे लाख व व्यकत सर्व सागित्ले सुरू हजार हा ही हे
होणार होत होता होती होते
""".split())

ODIA_STOP_WORDS = frozenset("""
। ଦେଇଛନ୍ତି ଲେଖାଏଁ ଜଣେ ଏହା ତେଣୁ ମିଳିଥାଏ ପାଇଁ ନେଉଛନ୍ତି ଯୋଗୁଁ
ଏପର୍ଯ୍ୟନ୍ତ ଏଭଳି କରୁଛି ଓ ଯାଏଁ ହୋଇଛନ୍ତି କି କରାଯିବା ପରେ ଏହି ଏବଂ ଜଣ ଥିବା
ହୋଇଥିଲା ତେବେ ଆଜି ଜଣଙ୍କ ଏଥି ଗତ ହୋଇଥିଲେ ହେଉଥିବା ଯୋଗେ ବୋଲି ଜଣାପଡ଼ିଛି
ଦ୍ବାରା କରି ଯାଇ ଏନେଇ ଚାଲୁ ରହିଛି ତାରିଖ ମିଳିଛି ବର୍ଷୀୟ ଦିନତଳେ ସହ
ଆସିଛନ୍ତି ମଧ୍ୟ କେଉଁ ହୋଇଯାଇଛି ନେଇଯାଇଛି କାମ କରିଛି ହେବା ଏବେ ହୋଇଛି ରଖି
ନିଆଯାଇଥିବା ପର୍ଯ୍ୟନ୍ତ କରିଛନ୍ତି ଉପରେ ଦେଲେ ଥର ଆଉ
""".split())

PUNJABI_STOP_WORDS = frozenset("""
ਅਗਲੀ ਅਤੇ ਅਿਜਹੇ ਅੰਦਰ ਅੱਸੀ ਆ ਆਈ ਆਖ ਆਦੀ ਆਪ ਆਪਣਾ ਆਮ ਆਵੇ ਇਸ ਇਹ ਇੱਕ ਇੱਥੇ
ਉਏ ਉਠ ਉਸ ਉਸਦੀ ਉਸਨੇ ਉਹ ਉੱਤੇ ਉੱਤੋਂ ਏ ਏਥੇ ਏਧਰ ਏਸ ਐਹੋ ਓਥੇ ਕਈ ਕਦ ਕਦੀ ਕਦੇ
ਕਰ ਕਰਕੇ ਕਰਣ ਕਰਵਾਈ ਕਰੀ ਕਾਫ਼ੀ ਕਿ ਕਿਤੇ ਕਿਸ ਕਿਸੇ ਕਿਹ ਕਿਹਾ ਕਿੰਨਾ ਕੀ ਕੀਤਾ
ਕੁਝ ਕੁਲ ਕੇ ਕੋਈ ਕੋਲੋਂ ਕੌਣ ਗਈ ਗਿਆ ਗੱਲ ਚਕੇ ਚਲਾ ਚਾਹੇ ਚੋ ਜਦ ਜਦੋਂ ਜਾਂ
ਜਾਂਦਾ ਜਾਵਣ ਜਾਵੇ ਜਿਨਾ ਜਿਨਾਂ ਜਿਨੂ ਜਿਨ੍ਹਾਂਨੂੰ ਜਿਵੇਂ ਜਿਸ ਜਿਹਾ ਜਿੱਥੇ ਜੀ
ਜੇ ਜੇਕਰ ਜੇਹੜਾ ਤਕ ਤਦ ਤਰ੍ਹਾਂ ਤਾਂ ਤੁਸਾ ਤੁਸੀ ਤੂੰ ਤੇ ਤੇਨੂੰ ਤੇਰਾ ਤੋਂ ਤੱਦ
ਦਾ ਦੀਆਂ ਦੁਆਰਾ ਦੇ ਦੇਖ ਦੇਣੀ ਦੌਰਾਨ ਨਹੀਂ ਨਾ ਨਾਲ ਨਾਲੇ ਨੂੰ ਨੇ ਨੇਂ ਪਰ ਪਾਸੋ
ਪਿਆ ਪਿਛੋਂ ਪੀ ਪੂਰਾ ਪੈਣ ਫਿਰ ਫੇਰ ਬਣ ਬਣਾ ਬਣਾਏ ਬਣੋ ਬਹਤੁ ਬਾਅਦ ਬਾਰੇ ਬਿਲਕੁਲ
ਭਾਵੇਂ ਭੀ ਮਗਰ ਮੇਰਾ ਮੈਂ ਰਹੀ ਰਹੇ ਰਿਹ ਰਿਹਾ ਰੱਖ ਲਈ ਲਗ ਲਗਾਉਦਾ ਲਾ ਲਾਇਆ ਲਿਆ
ਲੈ ਲੱਗ ਵਰਗ ਵਰਗਾ ਵਲੋਂ ਵਾਂਗ ਵਿਚ ਵੀ ਵੇਖ ਵੇਲੇ ਵਗ਼ੈਰਾ ਸਕਦੇ ਸਦਾ ਸਨ ਸਭ ਸਾਂ
ਸਾਬੁਤ ਸਾਰਾ ਸਾਰੇ ਸੀ ਸੁਣ ਹਣੁ ਹਣੇ ਹਨ ਹਾਲ ਹੀ ਹੁੰਦਾ ਹੇਠਾਂ ਹੈ ਹੈ। ਹੈਂ ਹੋ
ਹੋਇਆ ਹੋਏ ਹੋਣਾ ਹੋਵੇ
""".split())

SINHALA_STOP_WORDS = frozenset("""
සහ හා හෝ නමුත් එහෙත් එසේ මේ මෙම ඒ එය එම ඔහු ඇය ඔවුන් මම අපි අප ඔබ
ඔබගේ මගේ අපගේ ඔහුගේ ඇගේ ය වේ විය වූ වෙයි වන්නේ ඇත ඇති නැත නෑ නොවේ කර
කරන කළ කිරීමට කිරීම බව බවට සඳහා නිසා මෙන් පරිදි තුළ මත වෙත වල සිට
දක්වා ගැන ගැනි සියලු බොහෝ කිහිප එක් දෙක අද ඊයේ හෙට දැන් පසුව පෙර
කවදා කොහේ කෙසේ කවුද කුමක්
""".split())

AS_SUFFIXES = [
    "বিলাকৰ পৰা", "বিলাকলৈ", "বিলাকৰ", "বিলাকক", "বিলাকত", "বিলাক",
    "বোৰৰ পৰা", "বোৰলৈ", "বোৰৰ", "বোৰক", "বোৰত", "বোৰ",
    "সমূহৰ পৰা", "সমূহলৈ", "সমূহৰ", "সমূহক", "সমূহত", "সমূহ",
    "সকলৰ পৰা", "সকললৈ", "সকলৰ", "সকলক", "সকলত", "সকল",
    "কেইজনৰ", "কেইজনক", "কেইজন", "জনলৈ", "জনৰ", "জনক",
    "জনত", "জন", "খনলৈ", "খনৰ", "খনক", "খনত",
    "খন", "টোৰ", "টোক", "টোত", "টো", "টিৰ",
    "টিক", "টিত", "টি", "টাৰ", "টাক", "টাত",
    "টা", "লৈ", "ৰে", "ৰপৰা", "পৰা", "ত",
    "ক", "ৰ", "ে",
]

GU_SUFFIXES = [
    "માંથી", "પરથી", "માં", "થી", "પર", "નો",
    "ની", "નું", "ના", "ને", "નાં", "ઓ",
    "એ", "આં", "આ", "ઈ", "ું",
]

KN_SUFFIXES = [
    "ಗಳಿಂದಾಗಿ", "ಗಳಿಗಾಗಿ", "ಗಳೊಂದಿಗೆ", "ಗಳಲ್ಲಿನ", "ಗಳಲ್ಲಿ", "ಗಳಿಂದ",
    "ಗಳಿಗೆ", "ಗಳನ್ನು", "ಗಳನ್ನ", "ಗಳಾದ", "ಗಳ", "ಗಳು",
    "ರಿಗಾಗಿ", "ರಿಂದಾಗಿ", "ರೊಂದಿಗೆ", "ರಲ್ಲಿನ", "ರಲ್ಲಿ", "ರಿಂದ",
    "ರಿಗೆ", "ರನ್ನು", "ರಾದ", "ಯೊಂದಿಗೆ", "ಯಲ್ಲಿನ", "ಯಲ್ಲಿ",
    "ಯಿಂದ", "ಯಿಗೆ", "ಯನ್ನು", "ಯಾದ", "ದಲ್ಲಿನ", "ದಲ್ಲಿ",
    "ದಿಂದ", "ದಾಗಿ", "ದನ್ನು", "ದಾದ", "ನಿಗೆ", "ನಿಂದ",
    "ನಲ್ಲಿ", "ನನ್ನು", "ನಾದ", "ಕ್ಕಾಗಿ", "ಕ್ಕೆ", "ಗೆ",
    "ನ್ನು", "ನ್ನ", "ಲ್ಲಿ", "ದಿಂದ", "ಇಂದ", "ಯ",
    "ದ", "ರ",
]

ML_SUFFIXES = [
    "കളുടെ", "കളിൽനിന്ന്", "ങ്ങളിൽനിന്ന്", "ങ്ങളിൽ", "ങ്ങൾക്ക്", "ങ്ങൾക്ക്‌",
    "ങ്ങളോട്", "ങ്ങളാൽ", "ങ്ങളെ", "ങ്ങൾ", "മാരുടെ", "മാരിൽ",
    "മാർക്ക്", "മാരെ", "മാർ", "ത്തിനായി", "ത്തോട്", "ത്തിൽ",
    "ത്തിന്റെ", "ത്തിന്റേ", "ത്തിനു", "ത്തിന്", "ത്താൽ", "ക്കായി",
    "ക്കുള്ള", "ക്കുള്ളിൽ", "ക്കു", "ക്ക്", "യ്ക്ക്", "യോട്",
    "യോടെ", "യിൽ", "യുടെ", "യാൽ", "യെ", "കൊണ്ട്",
    "കുറിച്ച്", "വേണ്ടി", "പോലെ", "ശേഷം", "മുമ്പ്", "നിന്ന്",
    "ഇൽ", "ൽ", "ന്", "നെ", "ഓട്", "ആൽ",
    "കൾ", "കള്",
]

OR_SUFFIXES = [
    "ମାନଙ୍କର", "ମାନଙ୍କଠାରୁ", "ମାନଙ୍କୁ", "ମାନଙ୍କ", "ଗୁଡ଼ିକରେ", "ଗୁଡ଼ିକରେ",
    "ଗୁଡ଼ିକର", "ଗୁଡ଼ିକର", "ଗୁଡିକରେ", "ଗୁଡିକର", "ଗୁଡ଼ିକୁ", "ଗୁଡ଼ିକୁ",
    "ଗୁଡିକୁ", "ଗୁଡ଼ିକ", "ଗୁଡ଼ିକ", "ଗୁଡିକ", "ଙ୍କଠାରୁ", "ଠାରୁ",
    "ିବାକୁ", "ବାକୁ", "ିବାର", "ିବା", "ଛନ୍ତି", "ଥିଲା",
    "ମାନେ", "ଙ୍କର", "ଙ୍କୁ", "ଙ୍କ", "ଟିକୁ", "ଟିରେ",
    "ଟିର", "ରେ", "ରୁ", "କୁ", "ର", "ଟି",
    "ଟା",
]

SI_SUFFIXES = [
    "වලින්", "වලට", "වල", "යන්ගෙන්", "යන්ගේ", "යන්ට",
    "යන්", "වන්ගෙන්", "වන්ගේ", "වන්ට", "වන්", "ගෙන්",
    "යෙන්", "වෙන්", "යේ", "ගේ", "වක්", "යක්",
    "කින්", "ට", "ින්", "ක්", "ව", "ය",
]

# (match, strip, add): cut len(strip) chars then append add
PA_RULES = [
    ("ਉਂਦੀਆਂ", "ਉਂਦੀਆਂ", ""),
    ("ਉਣੀਆਂ", "ਉਣੀਆਂ", ""),
    ("ਉਦਿਆਂ", "ਉਦਿਆਂ", ""),
    ("ਉਦੀਆਂ", "ਉਦੀਆਂ", ""),
    ("ਪੂਰਵਕ", "ਪੂਰਵਕ", ""),
    ("ਵਾਂਗੀਆ", "ਵਾਂਗੀਆ", ""),
    ("ਾਵਾਂਗਾ", "ਵਾਂਗਾ", ""),
    ("ਾਵਾਂਗੀ", "ਵਾਂਗੀ", ""),
    ("ਾਵਾਂਗੇ", "ਵਾਂਗੇ", ""),
    ("ੀਕਰਨ", "ੀਕਰਨ", ""),
    ("ਪ੍ਰਸਤ", "ਪ੍ਰਸਤ", ""),
    ("ਸ਼ੀਲਤਾ", "ਸ਼ੀਲਤਾ", ""),
    ("ਉਂਦਾ", "ਉਂਦਾ", ""),
    ("ਉਂਦੀ", "ਉਂਦੀ", ""),
    ("ਉਂਦੇ", "ਉਂਦੇ", ""),
    ("ਉਣਾ", "ਉਣਾ", ""),
    ("ਉਣੀ", "ਉਣੀ", ""),
    ("ਉਣੇ", "ਉਣੇ", ""),
    ("ਆਵਣੀ", "ਆਵਣੀ", ""),
    ("ਈਆਂ", "ਈਆਂ", ""),
    ("ਇਆਂ", "ਿਆਂ", ""),
    ("ੀਆਂ", "ਆਂ", ""),
    ("ਿਆਂ", "ਿਆਂ", "ਾ"),
    ("ੂਆਂ", "ਆਂ", ""),
    ("ੋਆਂ", "ਆਂ", ""),
    ("ਦੀਆਂ", "ਆਂ", ""),
    ("ਨੀਆਂ", "ੀਆਂ", ""),
    ("ਾਵਣੀ", "ਵਣੀ", ""),
    ("ਾਂਗਾ", "ਾਂਗਾ", ""),
    ("ਾਂਗੀ", "ਾਂਗੀ", ""),
    ("ਾਂਗੇ", "ਾਂਗੇ", ""),
    ("ੇਗੀ", "ੇਗੀ", ""),
    ("ੇਗਾ", "ੇਗਾ", ""),
    ("ੋਗੀ", "ੋਗੀ", ""),
    ("ੋਗੇ", "ੋਗੇ", ""),
    ("ਏਗਾ", "ਏਗਾ", ""),
    ("ਏਗੀ", "ਏਗੀ", ""),
    ("ਵੇਗਾ", "ਵੇਗਾ", ""),
    ("ਵੇਗੀ", "ਵੇਗੀ", ""),
    ("ਣਗੇ", "ਣਗੇ", ""),
    ("ਣੀਆਂ", "ਣੀਆਂ", ""),
    ("ਉਦਿਆਂ", "ਉਦਿਆਂ", ""),
    ("ਆਵਣ", "ਵਣ", ""),
    ("ਕਰਣ", "ਕਰਣ", ""),
    ("ਕਾਰਕ", "ਕਾਰਕ", ""),
    ("ਜਨਕ", "ਜਨਕ", ""),
    ("ਗਰਦੀ", "ਗਰਦੀ", ""),
    ("ਤੰਤਰ", "ਤੰਤਰ", ""),
    ("ਦਾਇਕ", "ਦਾਇਕ", ""),
    ("ਨਵੀਸ", "ਨਵੀਸ", ""),
    ("ਪਾਤਰ", "ਪਾਤਰ", ""),
    ("ਪੂਰਣ", "ਪੂਰਣ", ""),
    ("ਸ਼ਕਤੀ", "ਸ਼ਕਤੀ", ""),
    ("ਓਗੇ", "ਓਗੇ", ""),
    ("ਣਾ", "ਣਾ", ""),
    ("ਆਣੀ", "ਆਣੀ", ""),
    ("ਆਰਾ", "ਆਰਾ", ""),
    ("ਆਰੀ", "ਆਰੀ", ""),
    ("ਆਲਾ", "ਆਲਾ", ""),
    ("ਆਲੂ", "ਆਲੂ", ""),
    ("ਏਟਾ", "ਏਟਾ", ""),
    ("ਏਟੀ", "ਏਟੀ", ""),
    ("ਏਰਾ", "ਏਰਾ", ""),
    ("ਏਲੀ", "ਏਲੀ", ""),
    ("ਈਲਾ", "ਈਲਾ", ""),
    ("ਕਾਰ", "ਕਾਰ", ""),
    ("ਕਾਰੀ", "ਕਾਰੀ", ""),
    ("ਕੁਸ਼ੀ", "ਕੁਸ਼ੀ", ""),
    ("ਖੋਰਾਂ", "ਖੋਰਾਂ", ""),
    ("ਖ਼ੋਰ", "ਖ਼ੋਰ", ""),
    ("ਖੋਰ", "ਖੋਰ", ""),
    ("ਖ਼ਾਨਾ", "ਖ਼ਾਨਾ", ""),
    ("ਗਾਰ", "ਗਾਰ", ""),
    ("ਗਿਰੀ", "ਗਿਰੀ", ""),
    ("ਗੀਰ", "ਗੀਰ", ""),
    ("ਘਾਤ", "ਘਾਤ", ""),
    ("ਚਾਰੀ", "ਚਾਰੀ", ""),
    ("ਤਾਈ", "ਤਾਈ", ""),
    ("ਤੇਰਾ", "ਤੇਰਾ", ""),
    ("ਦਾਨ", "ਦਾਨ", ""),
    ("ਦਾਰੀ", "ਦਾਰੀ", ""),
    ("ਦਿਲ", "ਦਿਲ", ""),
    ("ਂਦੀਆ", "ਂਦੀਆ", ""),
    ("ਦਿਆ", "ਦਿਆ", ""),
    ("ਦੀਆ", "ਆ", ""),
    ("ਧਾਰ", "ਧਾਰ", ""),
    ("ਧਾਰੀ", "ਧਾਰੀ", ""),
    ("ਨਾਕ", "ਨਾਕ", ""),
    ("ਪੁਣਾ", "ਪੁਣਾ", ""),
    ("ਪੁੱਣਾ", "ਪੁੱਣਾ", ""),
    ("ਪੋਸ਼", "ਪੋਸ਼", ""),
    ("ਪੰਥੀ", "ਪੰਥੀ", ""),
    ("ਬਾਜ਼ੀ", "ਬਾਜ਼ੀ", ""),
    ("ਬਾਜੀ", "ਬਾਜੀ", ""),
    ("ਬਾਨ", "ਬਾਨ", ""),
    ("ਬਾਜ", "ਬਾਜ", ""),
    ("ਬੱਧ", "ਬੱਧ", ""),
    ("ਬਾਜ਼", "ਬਾਜ਼", ""),
    ("ਮਾਨ", "ਮਾਨ", ""),
    ("ਮਾਰ", "ਮਾਰ", ""),
    ("ਮੁਖੀ", "ਮੁਖੀ", ""),
    ("ਮੰਦੀ", "ਮੰਦੀ", ""),
    ("ਮੰਦ", "ਮੰਦ", ""),
    ("ਯੋਗ", "ਯੋਗ", ""),
    ("ਵਾਂਗਾ", "ਵਾਂਗਾ", ""),
    ("ਵਾਂਗੇ", "ਵਾਂਗੇ", ""),
    ("ਵਾਂਗੀ", "ਵਾਂਗੀ", ""),
    ("ਵੋਗੇ", "ਵੋਗੇ", ""),
    ("ਵਾਲਾ", "ਵਾਲਾ", ""),
    ("ਾਵਲੀ", "ਾਵਲੀ", ""),
    ("ਾਵਟ", "ਾਵਟ", ""),
    ("ਵਟੀ", "ਵਟੀ", ""),
    ("ਾਵਣ", "ਵਣ", ""),
    ("ਵਾਲ", "ਵਾਲ", ""),
    ("ਵੰਤੀ", "ਵੰਤੀ", ""),
    ("ਵੰਤ", "ਵੰਤ", ""),
    ("ਵੰਦ", "ਵੰਦ", ""),
    ("ਸ਼ੀਲ", "ਸ਼ੀਲ", ""),
    ("ਸਾਜ਼", "ਸਾਜ਼", ""),
    ("ਸਾਜ", "ਸਾਜ", ""),
    ("ਸਾਰ", "ਸਾਰ", ""),
    ("ਸਾਲ", "ਸਾਲ", ""),
    ("ਹਾਰੀ", "ਹਾਰੀ", ""),
    ("ਹਾਰਾ", "ਹਾਰਾ", ""),
    ("ਹਾਰ", "ਹਾਰ", ""),
    ("ਹੀਣ", "ਹੀਣ", ""),
    ("ਾਹਟ", "ਾਹਟ", ""),
    ("ਿਉਂ", "ਿਉਂ", "ਾ"),
    ("ਿਓਂ", "ਿਓਂ", "ੇ"),
    ("ਿਆਈ", "ਿਆਈ", "ਾ"),
    ("ਿਆ", "ਿਆ", "ਾ"),
    ("ਿਏ", "ਿਏ", "ੀ"),
    ("ੀਏ", "ਏ", ""),
    ("ਈਂ", "ਈਂ", ""),
    ("ਓਣ", "ਓਣ", ""),
    ("ਅਈ", "ਅਈ", ""),
    ("ਅਣ", "ਅਣ", ""),
    ("ਅਤ", "ਅਤ", ""),
    ("ਆਈ", "ਆਈ", ""),
    ("ਆਉਂ", "ਆਉਂ", ""),
    ("ਆਉ", "ਆਉ", ""),
    ("ਆਕ", "ਆਕ", ""),
    ("ਆਨ", "ਆਨ", ""),
    ("ਆਰ", "ਆਰ", ""),
    ("ਆਲ", "ਆਲ", ""),
    ("ਐਲ", "ਐਲ", ""),
    ("ਆੜੀ", "ਆੜੀ", ""),
    ("ਇਕ", "ਇਕ", ""),
    ("ਇਤ", "ਇਤ", ""),
    ("ਇਆ", "ਇਆ", ""),
    ("ਈਆ", "ਆ", ""),
    ("ਈਨ", "ਈਨ", ""),
    ("ਇਏ", "ਇਏ", ""),
    ("ਈਏ", "ਈਏ", ""),
    ("ਤਣ", "ਣ", ""),
    ("ਤਰ", "ਤਰ", ""),
    ("ਧਰ", "ਧਰ", ""),
    ("ਪਣ", "ਪਣ", ""),
    ("ਪਨ", "ਪਨ", ""),
    ("ਪੁਰ", "ਪੁਰ", ""),
    ("ਗਰ", "ਗਰ", ""),
    ("ਘਰ", "ਘਰ", ""),
    ("ਵਟ", "ਵਟ", ""),
    ("ਵਰ", "ਵਰ", ""),
    ("ਵਾਦ", "ਵਾਦ", ""),
    ("ਵਾਨ", "ਵਾਨ", ""),
    ("ਾਂ", "ਾਂ", ""),
    ("ਆਂ", "ਆਂ", ""),
    ("ਆ", "ਆ", ""),
    ("ਾਈ", "ਾਈ", ""),
    ("ਈ", "ਈ", ""),
    ("ਏ", "ਏ", ""),
    ("ਕੇ", "ਕੇ", ""),
    ("ਗੀ", "ਗੀ", ""),
    ("ਚੀ", "ੀ", ""),
    ("ਣੀ", "ਣੀ", ""),
    ("ਊ", "ਊ", ""),
    ("ਉ", "ਉ", ""),
    ("ਓ", "ਓ", ""),
]

MR_TIERS = [
    (6, ('ाएंगी', 'ाएंगे', 'ाऊंगी', 'ाऊंगा', 'ाइयाँ', 'ाइयों', 'ाइयां'), 5),
    (5, ('ाएगी', 'ाएगा', 'ाओगी', 'ाओगे', 'एंगी', 'ेंगी', 'एंगे', 'ेंगे', 'ूंगी', 'ूंगा', 'ातीं', 'नाओं', 'नाएं', 'ताओं', 'ताएं', 'ियाँ', 'ियों', 'ियां'), 4),
    (4, ('ाकर', 'ाइए', 'ाईं', 'ाया', 'ेगी', 'ेगा', 'ोगी', 'ोगे', 'ाने', 'ाना', 'ाते', 'ाती', 'ाता', 'तीं', 'ाओं', 'ाएं', 'ुओं', 'ुएं', 'ुआं'), 3),
    (3, ('कर', 'ाओ', 'िए', 'ाई', 'ाए', 'ने', 'नी', 'ना', 'ते', 'ीं', 'ती', 'ता', 'ाँ', 'ां', 'ों', 'ें'), 2),
    (2, ('ो', 'े', 'ू', 'ु', 'ी', 'ि', 'ा'), 1),
]


_ZW = ("\u200c", "\u200d")


def _scan_normalize(s: str, lang: str) -> str:
    """Exact ports of the per-language normalizer scans."""
    out: list[str] = []
    prev_block = False
    for c in s:
        o = ord(c)
        if lang == "as":
            if c == "\u09f7":
                c = "\u0964"
            elif c == ":" and prev_block:
                c = "\u0983"
            elif c == "\u09b0":
                c = "\u09f0"
            elif c in _ZW:
                prev_block = bool(out) and \
                    0x0980 <= ord(out[-1]) <= 0x09FF
                continue
            prev_block = 0x0980 <= ord(c) <= 0x09FF
        elif lang == "gu":
            if c == "\u0ae4":
                c = "\u0964"
            elif c == "\u0ae5":
                c = "\u0965"
            elif c == ":" and prev_block:
                c = "\u0a83"
            prev_block = 0x0A80 <= ord(c) <= 0x0AFF
        elif lang == "kn":
            if c == "\u0ce4":
                c = "\u0964"
            elif c == "\u0ce5":
                c = "\u0965"
            elif c == ":" and prev_block:
                c = "\u0c83"
            elif c in _ZW:
                prev_block = bool(out) and \
                    0x0C80 <= ord(out[-1]) <= 0x0CFF
                continue
            prev_block = 0x0C80 <= ord(c) <= 0x0CFF
        elif lang == "ml":
            if c in _ZW:
                continue
            if c == "\u0d64":
                c = "\u0964"
            elif c == "\u0d65":
                c = "\u0965"
        elif lang == "or":
            if c == "\u0b64":
                c = "\u0964"
            elif c == "\u0b65":
                c = "\u0965"
            elif c == ":" and prev_block:
                c = "\u0b03"
            elif c in _ZW:
                prev_block = bool(out) and \
                    0x0B00 <= ord(out[-1]) <= 0x0B7F
                continue
            prev_block = 0x0B00 <= ord(c) <= 0x0B7F
        elif lang == "pa":
            if c == "\u0a64":
                c = "\u0964"
            elif c == "\u0a65":
                c = "\u0965"
            elif c == "\u0a01":
                c = "\u0a02"
            elif c in _ZW or c == "\u0a4d":
                continue
        elif lang == "si":
            if c == "\u0df4":
                c = "\u0964"
            elif c in _ZW:
                continue
        out.append(c)
    return "".join(out)


_MR_TRANS = str.maketrans({
    "\u0901": "\u0902", "\u0929": "\u0928", "\u0931": "\u0930",
    "\u0934": "\u0933", "\u0958": "\u0915", "\u0959": "\u0916",
    "\u095a": "\u0917", "\u095b": "\u091c", "\u095c": "\u0921",
    "\u095d": "\u0922", "\u095e": "\u092b", "\u095f": "\u092f",
    "\u0945": "\u0947", "\u0946": "\u0947", "\u0949": "\u094b",
    "\u094a": "\u094b", "\u090d": "\u090f", "\u090e": "\u090f",
    "\u0911": "\u0913", "\u0912": "\u0913", "\u0972": "\u0905",
    "\u0906": "\u0905", "\u0908": "\u0907", "\u090a": "\u0909",
    "\u0960": "\u090b", "\u0961": "\u090c", "\u0910": "\u090f",
    "\u0914": "\u0913", "\u0940": "\u093f", "\u0942": "\u0941",
    "\u0944": "\u0943", "\u0963": "\u0962", "\u0948": "\u0947",
    "\u094c": "\u094b",
})


def marathi_normalize(s: str) -> str:
    """MarathiNormalizer scan: न+् → ं first (on original
    adjacency), then nukta/ZW/virama deletes, then the fold table."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\u0928" and i + 1 < n and s[i + 1] == "\u094d":
            out.append("\u0902")
            i += 2
            continue
        if c in ("\u093c", "\u200c", "\u200d", "\u094d"):
            i += 1
            continue
        out.append(c.translate(_MR_TRANS))
        i += 1
    return "".join(out)


def _one_suffix_stem(w: str, suffixes, min_stem: int = 2) -> str:
    if len(w) <= min_stem:
        return w
    for sfx in suffixes:
        if len(w) >= len(sfx) + min_stem and w.endswith(sfx):
            return w[:len(w) - len(sfx)]
    return w


def punjabi_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    for match, strip, add in PA_RULES:
        if len(w) > len(match) + 1 and w.endswith(match):
            out = w[:len(w) - len(strip)] + add
            return w if len(out) < 2 else out
    return w


def marathi_stem(w: str) -> str:
    for min_len, suffixes, drop in MR_TIERS:
        if len(w) > min_len and w.endswith(suffixes):
            return w[:len(w) - drop]
    return w




class AssameseAnalyzer(_RomanceAnalyzer):
    name = "assamese"
    stop_words = ASSAMESE_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "as")

    def _stem(self, tok: str) -> str:
        return _one_suffix_stem(tok, AS_SUFFIXES)




class GujaratiAnalyzer(_RomanceAnalyzer):
    name = "gujarati"
    stop_words = GUJARATI_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "gu")

    def _stem(self, tok: str) -> str:
        return _one_suffix_stem(tok, GU_SUFFIXES)




class KannadaAnalyzer(_RomanceAnalyzer):
    name = "kannada"
    stop_words = KANNADA_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "kn")

    def _stem(self, tok: str) -> str:
        return _one_suffix_stem(tok, KN_SUFFIXES)




class MalayalamAnalyzer(_RomanceAnalyzer):
    name = "malayalam"
    stop_words = MALAYALAM_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "ml")

    def _stem(self, tok: str) -> str:
        return _one_suffix_stem(tok, ML_SUFFIXES)




class MarathiAnalyzer(_RomanceAnalyzer):
    name = "marathi"
    stop_words = MARATHI_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return marathi_normalize(indic_normalize(fold_digits(tok)))

    def _stem(self, tok: str) -> str:
        return marathi_stem(tok)




class OdiaAnalyzer(_RomanceAnalyzer):
    name = "odia"
    stop_words = ODIA_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "or")

    def _stem(self, tok: str) -> str:
        return _one_suffix_stem(tok, OR_SUFFIXES)




class PunjabiAnalyzer(_RomanceAnalyzer):
    name = "punjabi"
    stop_words = PUNJABI_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "pa")

    def _stem(self, tok: str) -> str:
        return punjabi_stem(tok)




class SinhalaAnalyzer(_RomanceAnalyzer):
    name = "sinhala"
    stop_words = SINHALA_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return _scan_normalize(indic_normalize(fold_digits(tok)), "si")

    def _stem(self, tok: str) -> str:
        return _one_suffix_stem(tok, SI_SUFFIXES)
