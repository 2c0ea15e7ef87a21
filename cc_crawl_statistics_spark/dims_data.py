"""Vendored public dimension facts (GENERATED — edit tools/gen_dims_data.py).

Four tables the reference embeds as Python data, re-encoded compactly:

1. IANA TLD classification (reference top_level_domain.py:122ff; source:
   https://www.iana.org/domains/root/db — public registry facts). Stored
   as short-type -> space-joined TLD list; expanded to (tld, tld_type)
   rows. 1767 rows, pinned by tests/test_psl_dims.py.
2. TLD -> continent map (reference plot/tld_by_continent.py:27-124;
   ISO-3166 country/continent facts + geographic gTLDs + the special
   'com,net'/'org'/'edu'/'gov,mil' buckets). 'aq' (Antarctica) is kept in
   the table but excluded at lookup time, matching tld2continent.
   464 rows.
3. IDN ccTLD -> first-level ASCII ccTLD (reference
   top_level_domain.py tld_ccs — both the punycode and the unicode form
   of each IDN ccTLD map to its country code, e.g. xn--p1ai -> ru and
   рф -> ru). 128 rows. Used by tld_dim to roll IDN ccTLDs up to
   their country the way TopLevelDomain.first_level does
   (top_level_domain.py:24-42).
4. MonthlyCrawl registry (reference crawlstats.py:35-167): 126 crawl
   names with their *registration-order* ids — NOT chronological: ids
   0-87 run CC-MAIN-2014-52..2024-22, ids 88-99 are 12 historical
   crawls added later, ids 100-125 resume at CC-MAIN-2024-26. Bitmask
   semantics (is_new / is_newest, crawlstats.py:249-270) key on these
   ids, so the registry must be vendored, not derived from sort order.

Wrapping invariant: every embedded line is a whole number of
space-terminated tokens — a token NEVER crosses a string-literal
boundary (the round-2 corruption class). tests/test_psl_dims.py pins
token integrity and row counts.
"""

from __future__ import annotations

# --- 1. IANA TLD classification --------------------------------------------

_TLD_TYPE_GROUPS = {
    "ARPA": (
        "arpa "
    ),
    "IDN ccTLD": (
        "xn--2scrj9c xn--3e0b707e xn--3hcrj9c xn--45br5cyl xn--45brj9c "
        "xn--4dbrk0ce xn--54b7fta0cc xn--80ao21a xn--90a3ac xn--90ae "
        "xn--90ais xn--clchc0ea0b2g2a9gcd xn--d1alf xn--e1a4c xn--fiqs8s "
        "xn--fiqz9s xn--fpcrj9c3d xn--fzc2c9e2c xn--gecrj9c xn--h2breg3eve "
        "xn--h2brj9c xn--h2brj9c8c xn--j1amh xn--j6w193g xn--kprw13d "
        "xn--kpry57d xn--l1acc xn--lgbbat1ad8j xn--mgb2ddes xn--mgb9awbf "
        "xn--mgba3a4f16a xn--mgbaam7a8h xn--mgbah1a3hjkrd xn--mgbai9azgqp6j "
        "xn--mgbayh7gpa xn--mgbb7fyab xn--mgbbh1a xn--mgbbh1a71e "
        "xn--mgbc0a9azcg xn--mgbcpq6gpa1a xn--mgberp4a5d4ar xn--mgbgu82a "
        "xn--mgbpl2fh xn--mgbtx2b xn--mgbx4cd0ab xn--mix082f xn--mix891f "
        "xn--node xn--o3cw4h xn--ogbpf8fl xn--p1ai xn--pgbs0dh xn--q7ce6a "
        "xn--qxa6a xn--qxam xn--rvc1e0am3e xn--s9brj9c xn--wgbh1c "
        "xn--wgbl6a xn--xkc2al3hye2a xn--xkc2dl3a5ee0h xn--y9a3aq "
        "xn--yfro4i67o xn--ygbi2ammx ελ ευ бг бел ею мкд мон рф срб укр қаз "
        "հայ ישראל الاردن البحرين الجزائر السعودية المغرب اليمن امارات "
        "ایران بارت بھارت تونس سودان سورية عراق عمان فلسطين قطر ليبيا مصر "
        "مليسيا موريتانيا پاکستان ڀارت भारत भारतम् भारोत বাংলা ভারত ভাৰত "
        "ਭਾਰਤ ભારત ଭାରତ இந்தியா இலங்கை சிங்கப்பூர் భారత్ ಭಾರತ ഭാരതം ලංකා "
        "ไทย ລາວ გე 中国 中國 台湾 台灣 新加坡 澳門 澳门 香港 한국 "
    ),
    "IDN gTLD": (
        "vermögensberater vermögensberatung xn--11b4c3d xn--1ck2e1b "
        "xn--1qqw23a xn--30rr7y xn--3bst00m xn--3ds443g xn--3oq18vl8pn36a "
        "xn--3pxu8k xn--42c2d9a xn--45q11c xn--4gbrim xn--55qw42g "
        "xn--55qx5d xn--5su34j936bgsg xn--5tzm5g xn--6frz82g xn--6qq986b3xl "
        "xn--80adxhks xn--80aqecdr1a xn--80asehdb xn--80aswg xn--8y0a063a "
        "xn--9dbq2a xn--9et52u xn--9krt00a xn--b4w605ferd xn--bck1b9a5dre4c "
        "xn--c1avg xn--c2br7g xn--cck2b3b xn--cckwcxetd xn--cg4bki "
        "xn--czr694b xn--czrs0t xn--czru2d xn--d1acj3b xn--eckvdtc9d "
        "xn--efvy88h xn--estv75g xn--fct429k xn--fhbei xn--fiq228c5hs "
        "xn--fiq64b xn--fjq720a xn--flw351e xn--fzys8d69uvgm xn--g2xx48c "
        "xn--gckr3f0f xn--gk3at1e xn--hxt814e xn--i1b6b1a6a2e xn--imr513n "
        "xn--io0a7i xn--j1aef xn--jlq480n2rg xn--jlq61u9w7b xn--jvr189m "
        "xn--kcrx77d1x4a xn--kpu716f xn--kput3i xn--mgba3a3ejt "
        "xn--mgba7c0bbn0a xn--mgbaakc7dvf xn--mgbab2bd xn--mgbb9fbpob "
        "xn--mgbca7dzdo xn--mgbi4ecexp xn--mgbt3dhd xn--mk1bu44c xn--mxtq1m "
        "xn--ngbc5azd xn--ngbe9e0a xn--ngbrx xn--nqv7f xn--nqv7fs00ema "
        "xn--nyqy26a xn--otu796d xn--p1acf xn--pbt977c xn--pssy2u "
        "xn--q9jyb4c xn--qcka1pmc xn--rhqv96g xn--rovu88b xn--ses554g "
        "xn--t60b56a xn--tckwe xn--tiq49xqyj xn--unup4y "
        "xn--vermgensberater-ctb xn--vermgensberatung-pwb xn--vhquv "
        "xn--vuq861b xn--w4r85el8fhu5dnra xn--w4rs40l xn--xhq521b "
        "xn--zfr164b дети католик ком москва онлайн орг рус сайт קום ابوظبي "
        "اتصالات ارامكو العليان بازار بيتك شبكة عرب كاثوليك كوم موبايلي "
        "موقع همراه कॉम नेट संगठन คอม みんな アマゾン クラウド グーグル コム ストア セール ファッション "
        "ポイント 世界 中信 中文网 亚马逊 企业 佛山 信息 健康 八卦 公司 公益 商城 商店 商标 嘉里 嘉里大酒店 在线 大众汽车 "
        "大拿 天主教 娱乐 家電 工行 广东 微博 慈善 我爱你 手机 手表 招聘 政务 政府 新闻 时尚 書籍 机构 淡马锡 游戏 点看 "
        "珠宝 移动 组织机构 网址 网店 网站 网络 联通 诺基亚 谷歌 购物 通販 集团 電訊盈科 飞利浦 食品 餐厅 香格里拉 닷넷 "
        "닷컴 삼성 "
    ),
    "ccTLD": (
        "ac ad ae af ag ai al am an ao aq ar as at au aw ax az ba bb bd be "
        "bf bg bh bi bj bl bm bn bo bq br bs bt bv bw by bz ca cc cd cf cg "
        "ch ci ck cl cm cn co cr cu cv cw cx cy cz de dj dk dm do dz ec ee "
        "eg eh er es et eu fi fj fk fm fo fr ga gb gd ge gf gg gh gi gl gm "
        "gn gp gq gr gs gt gu gw gy hk hm hn hr ht hu id ie il im in io iq "
        "ir is it je jm jo jp ke kg kh ki km kn kp kr kw ky kz la lb lc li "
        "lk lr ls lt lu lv ly ma mc md me mf mg mh mk ml mm mn mo mp mq mr "
        "ms mt mu mv mw mx my mz na nc ne nf ng ni nl no np nr nu nz om pa "
        "pe pf pg ph pk pl pm pn pr ps pt pw py qa re ro rs ru rw sa sb sc "
        "sd se sg sh si sj sk sl sm sn so sr ss st su sv sx sy sz tc td tf "
        "tg th tj tk tl tm tn to tp tr tt tv tw tz ua ug uk um us uy uz va "
        "vc ve vg vi vn vu wf ws ye yt za zm zw "
    ),
    "gTLD": (
        "aaa aarp abarth abb abbott abbvie abc able abogado abudhabi "
        "academy accenture accountant accountants aco active actor adac ads "
        "adult aeg aetna afamilycompany afl africa agakhan agency aig aigo "
        "airbus airforce airtel akdn alfaromeo alibaba alipay allfinanz "
        "allstate ally alsace alstom amazon americanexpress americanfamily "
        "amex amfam amica amsterdam analytics android anquan anz aol "
        "apartments app apple aquarelle arab aramco archi army art arte "
        "asda associates athleta attorney auction audi audible audio "
        "auspost author auto autos avianca aws axa azure baby baidu banamex "
        "bananarepublic band bank bar barcelona barclaycard barclays "
        "barefoot bargains baseball basketball bauhaus bayern bbc bbt bbva "
        "bcg bcn beats beauty beer bentley berlin best bestbuy bet bharti "
        "bible bid bike bing bingo bio black blackfriday blanco blockbuster "
        "blog bloomberg blue bms bmw bnl bnpparibas boats boehringer bofa "
        "bom bond boo book booking boots bosch bostik boston bot boutique "
        "box bradesco bridgestone broadway broker brother brussels budapest "
        "bugatti build builders business buy buzz bzh cab cafe cal call "
        "calvinklein cam camera camp cancerresearch canon capetown capital "
        "capitalone car caravan cards care career careers cars cartier casa "
        "case caseih cash casino catering catholic cba cbn cbre cbs ceb "
        "center ceo cern cfa cfd chanel channel charity chase chat cheap "
        "chintai chloe christmas chrome chrysler church cipriani circle "
        "cisco citadel citi citic city cityeats claims cleaning click "
        "clinic clinique clothing cloud club clubmed coach codes coffee "
        "college cologne com comcast commbank community company compare "
        "computer comsec condos construction consulting contact contractors "
        "cooking cookingchannel cool corsica country coupon coupons courses "
        "cpa credit creditcard creditunion cricket crown crs cruise cruises "
        "csc cuisinella cymru cyou dabur dad dance data date dating datsun "
        "day dclk dds deal dealer deals degree delivery dell deloitte delta "
        "democrat dental dentist desi design dev dhl diamonds diet digital "
        "direct directory discount discover dish diy dnp docs doctor dodge "
        "dog doha domains doosan dot download drive dtv dubai duck dunlop "
        "duns dupont durban dvag dvr earth eat eco edeka education email "
        "emerck emerson energy engineer engineering enterprises epost epson "
        "equipment ericsson erni esq estate esurance etisalat eurovision "
        "eus events everbank exchange expert exposed express extraspace "
        "fage fail fairwinds faith family fan fans farm farmers fashion "
        "fast fedex feedback ferrari ferrero fiat fidelity fido film final "
        "finance financial fire firestone firmdale fish fishing fit fitness "
        "flickr flights flir florist flowers flsmidth fly foo food "
        "foodnetwork football ford forex forsale forum foundation fox free "
        "fresenius frl frogans frontdoor frontier ftr fujitsu fujixerox fun "
        "fund furniture futbol fyi gal gallery gallo gallup game games gap "
        "garden gay gbiz gdn gea gent genting george ggee gift gifts gives "
        "giving glade glass gle global globo gmail gmbh gmo gmx godaddy "
        "gold goldpoint golf goo goodhands goodyear goog google gop got "
        "grainger graphics gratis green gripe grocery group guardian gucci "
        "guge guide guitars guru hair hamburg hangout haus hbo hdfc "
        "hdfcbank health healthcare help helsinki here hermes hgtv hiphop "
        "hisamitsu hitachi hiv hkt hockey holdings holiday homedepot "
        "homegoods homes homesense honda honeywell horse hospital host "
        "hosting hot hoteles hotels hotmail house how hsbc htc hughes hyatt "
        "hyundai ibm icbc ice icu ieee ifm iinet ikano imamat imdb immo "
        "immobilien inc industries infiniti info ing ink institute "
        "insurance insure intel international intuit investments ipiranga "
        "irish iselect ismaili ist istanbul itau itv iveco iwc jaguar java "
        "jcb jcp jeep jetzt jewelry jio jlc jll jmp jnj joburg jot joy "
        "jpmorgan jprs juegos juniper kaufen kddi kerryhotels "
        "kerrylogistics kerryproperties kfh kia kids kim kinder kindle "
        "kitchen kiwi koeln komatsu kosher kpmg kpn krd kred kuokgroup "
        "kyoto lacaixa ladbrokes lamborghini lamer lancaster lancia lancome "
        "land landrover lanxess lasalle lat latino latrobe law lawyer lds "
        "lease leclerc lefrak legal lego lexus lgbt liaison lidl life "
        "lifeinsurance lifestyle lighting like lilly limited limo lincoln "
        "linde link lipsy live living lixil llc llp loan loans locker locus "
        "loft lol london lotte lotto love lpl lplfinancial ltd ltda "
        "lundbeck lupin luxe luxury macys madrid maif maison makeup man "
        "management mango map market marketing markets marriott marshalls "
        "maserati mattel mba mcd mcdonalds mckinsey med media meet "
        "melbourne meme memorial men menu meo merckmsd metlife miami "
        "microsoft mini mint mit mitsubishi mlb mls mma mobi mobile mobily "
        "moda moe moi mom monash money monster montblanc mopar mormon "
        "mortgage moscow moto motorcycles mov movie movistar msd mtn mtpc "
        "mtr music mutual mutuelle nab nadex nagoya nationwide natura navy "
        "nba nec net netbank netflix network neustar new newholland news "
        "next nextdirect nexus nfl ngo nhk nico nike nikon ninja nissan "
        "nissay nokia northwesternmutual norton now nowruz nowtv nra nrw "
        "ntt nyc obi observer off office okinawa olayan olayangroup oldnavy "
        "ollo omega one ong onl online onyourside ooo open oracle orange "
        "org organic orientexpress origins osaka otsuka ott ovh page "
        "pamperedchef panasonic panerai paris pars partners parts party "
        "passagens pay pccw pet pfizer pharmacy phd philips phone photo "
        "photography photos physio piaget pics pictet pictures pid pin ping "
        "pink pioneer pizza place play playstation plumbing plus pnc pohl "
        "poker politie porn pramerica praxi press prime prod productions "
        "prof progressive promo properties property protection pru "
        "prudential pub pwc qpon quebec quest qvc racing radio raid read "
        "realestate realtor realty recipes red redstone redumbrella rehab "
        "reise reisen reit reliance ren rent rentals repair report "
        "republican rest restaurant review reviews rexroth rich richardli "
        "ricoh rightathome ril rio rip rmit rocher rocks rodeo rogers room "
        "rsvp rugby ruhr run rwe ryukyu saarland safe safety sakura sale "
        "salon samsclub samsung sandvik sandvikcoromant sanofi sap sapo "
        "sarl sas save saxo sbi sbs sca scb schaeffler schmidt scholarships "
        "school schule schwarz science scjohnson scor scot search seat "
        "secure security seek select sener services ses seven sew sex sexy "
        "sfr shangrila sharp shaw shell shia shiksha shoes shop shopping "
        "shouji show showtime shriram silk sina singles site ski skin sky "
        "skype sling smart smile sncf soccer social softbank software sohu "
        "solar solutions song sony soy spa space spiegel sport spot "
        "spreadbetting srl srt stada staples star starhub statebank "
        "statefarm statoil stc stcgroup stockholm storage store stream "
        "studio study style sucks supplies supply support surf surgery "
        "suzuki swatch swiftcover swiss sydney symantec systems tab taipei "
        "talk taobao target tatamotors tatar tattoo tax taxi tci tdk team "
        "tech technology telecity telefonica temasek tennis teva thd "
        "theater theatre tiaa tickets tienda tiffany tips tires tirol "
        "tjmaxx tjx tkmaxx tmall today tokyo tools top toray toshiba total "
        "tours town toyota toys trade trading training travelchannel "
        "travelers travelersinsurance trust trv tube tui tunes tushu tvs "
        "ubank ubs uconnect unicom university uno uol ups vacations vana "
        "vanguard vegas ventures verisign versicherung vet viajes video vig "
        "viking villas vin vip virgin visa vision vista vistaprint viva "
        "vivo vlaanderen vodka volkswagen volvo vote voting voto voyage "
        "vuelos wales walmart walter wang wanggou warman watch watches "
        "weather weatherchannel webcam weber website wed wedding weibo weir "
        "whoswho wien wiki williamhill win windows wine winners wme "
        "wolterskluwer woodside work works world wow wtc wtf xbox xerox "
        "xfinity xihuan xin xperia xyz yachts yahoo yamaxun yandex "
        "yodobashi yoga yokohama you youtube yun zappos zara zero zip zippo "
        "zone zuerich "
    ),
    "grTLD": (
        "biz name pro "
    ),
    "internationalized test": (
        "xn--0zwm56d xn--11b5bs3a9aj6g xn--80akhbyknj4f xn--9t4b11yi5a "
        "xn--deba0ad xn--g6w251d xn--hgbk6aj7f53bba xn--hlcj6aya9esc7a "
        "xn--jxalpdlp xn--kgbechtv xn--zckzah δοκιμή испытание טעסט آزمایشی "
        "إختبار परीक्षा பரிட்சை テスト 测试 測試 테스트 "
    ),
    "sTLD": (
        "aero asia cat coop edu gov int jobs mil museum post tel travel xxx "
    ),
}


def tld_type_rows() -> list[tuple[str, str]]:
    """(tld, tld_type) rows, one per registered TLD."""
    return [
        (tld, typ)
        for typ, blob in _TLD_TYPE_GROUPS.items()
        for tld in blob.split()
    ]

# --- 2. TLD -> continent ---------------------------------------------------

_CONTINENT_GROUPS = {
    "Africa": (
        "africa ao bf bi bj bw capetown cd cf cg ci cm cv dj durban dz eg "
        "eh er et ga gh gm gn gq gw joburg ke km lr ls ly ma mg ml mr mu mw "
        "mz na ne ng re rw sc sd sh sl sn so ss st sz td tg tn tz ug "
        "xn--lgbbat1ad8j xn--mgbah1a3hjkrd xn--mgbb7fyab xn--mgbc0a9azcg "
        "xn--mgbpl2fh xn--pgbs0dh xn--wgbh1c yt za zm zw الجزائر المغرب "
        "تونس سودان ليبيا مصر موريتانيا "
    ),
    "Antarctica": (
        "aq "
    ),
    "Asia": (
        "abudhabi ae af am arab asia az bd bh bn bt cc cn cx doha dubai ge "
        "hk id il in io iq ir jo jp kg kh kp kr krd kw kyoto kz la lb lk mm "
        "mn mo mv my nagoya np okinawa om osaka ph pk ps qa ryukyu sa sg sy "
        "taipei th tj tm tokyo tp tr tw uz vn xn--1qqw23a xn--2scrj9c "
        "xn--3e0b707e xn--3hcrj9c xn--45br5cyl xn--45brj9c xn--4dbrk0ce "
        "xn--54b7fta0cc xn--80adxhks xn--80ao21a xn--clchc0ea0b2g2a9gcd "
        "xn--fiqs8s xn--fiqz9s xn--fpcrj9c3d xn--fzc2c9e2c xn--gecrj9c "
        "xn--h2breg3eve xn--h2brj9c xn--h2brj9c8c xn--j6w193g xn--kprw13d "
        "xn--kpry57d xn--l1acc xn--mgb2ddes xn--mgb9awbf xn--mgba3a4f16a "
        "xn--mgbaam7a8h xn--mgbai9azgqp6j xn--mgbayh7gpa xn--mgbbh1a "
        "xn--mgbbh1a71e xn--mgbca7dzdo xn--mgbcpq6gpa1a xn--mgberp4a5d4ar "
        "xn--mgbgu82a xn--mgbtx2b xn--mgbx4cd0ab xn--mix082f xn--mix891f "
        "xn--ngbrx xn--node xn--o3cw4h xn--ogbpf8fl xn--p1acf xn--q7ce6a "
        "xn--rvc1e0am3e xn--s9brj9c xn--wgbl6a xn--xhq521b xn--xkc2al3hye2a "
        "xn--xkc2dl3a5ee0h xn--y9a3aq xn--yfro4i67o xn--ygbi2ammx ye "
        "yokohama мон москва рус қаз հայ ישראל ابوظبي الاردن البحرين "
        "السعودية اليمن امارات ایران بارت بھارت سورية عراق عرب عمان فلسطين "
        "قطر مليسيا پاکستان ڀارت भारत भारतम् भारोत বাংলা ভারত ভাৰত ਭਾਰਤ "
        "ભારત ଭାରତ இந்தியா இலங்கை சிங்கப்பூர் భారత్ ಭಾರತ ഭാരതം ලංකා ไทย ລາວ "
        "გე 中国 中國 佛山 台湾 台灣 广东 新加坡 澳門 澳门 香港 한국 "
    ),
    "Europe": (
        "ad al alsace amsterdam at ax ba bar barcelona bayern bcn be berlin "
        "bg brussels bv by bzh cat ch cologne corsica cy cymru cz de dk ee "
        "es eu eus fi fo fr frl gal gb gent gg gi gr hamburg helsinki hr hu "
        "ie im irish is ist istanbul it je koeln li london lt lu lv madrid "
        "mc md me mk moscow mt nl no nrw paris pl pt ro rs ru ruhr saarland "
        "scot se si sj sk sm stockholm su swiss tatar tirol ua uk va "
        "vlaanderen wales wien xk xn--90a3ac xn--90ae xn--90ais xn--d1alf "
        "xn--e1a4c xn--j1amh xn--p1ai xn--qxa6a xn--qxam zuerich ελ ευ бг "
        "бел ею мкд рф срб укр "
    ),
    "North America": (
        "ag ai an aw bb bl bm boston bq bs bz ca cr cu cw dm do gd gl gp gt "
        "hn ht jm kn ky lc mf miami mq ms mx ni nyc pa pm pr quebec sv sx "
        "tc tt us vc vegas vg vi "
    ),
    "Oceania": (
        "as au ck fj fm gu ki kiwi melbourne mh mp nc nf nr nu nz pf pg pn "
        "pw sb sydney tk tl to tv vu wf ws "
    ),
    "South America": (
        "ar bo br cl co ec fk gf gy lat pe py rio sr uy ve "
    ),
    "com,net": (
        "com net "
    ),
    "edu": (
        "edu "
    ),
    "gov,mil": (
        "gov mil "
    ),
    "org": (
        "org "
    ),
}


def tld_continent_rows() -> list[tuple[str, str]]:
    """(tld, continent) rows; Antarctica excluded per tld2continent
    (plot/tld_by_continent.py:127-133)."""
    return [
        (tld, cont)
        for cont, blob in _CONTINENT_GROUPS.items()
        if cont != "Antarctica"
        for tld in blob.split()
    ]

# --- 3. IDN ccTLD -> first-level country code --------------------------------

# "idn>cc" tokens (reference top_level_domain.py tld_ccs)
_TLD_CC_FIRST_LEVEL = (
    "xn--2scrj9c>in xn--3e0b707e>kr xn--3hcrj9c>in xn--45br5cyl>in "
    "xn--45brj9c>in xn--4dbrk0ce>il xn--54b7fta0cc>bd xn--80ao21a>kz "
    "xn--90a3ac>rs xn--90ae>bg xn--90ais>by xn--clchc0ea0b2g2a9gcd>sg "
    "xn--d1alf>mk xn--e1a4c>eu xn--fiqs8s>cn xn--fiqz9s>cn xn--fpcrj9c3d>in "
    "xn--fzc2c9e2c>lk xn--gecrj9c>in xn--h2breg3eve>in xn--h2brj9c8c>in "
    "xn--h2brj9c>in xn--j1amh>ua xn--j6w193g>hk xn--kprw13d>tw "
    "xn--kpry57d>tw xn--l1acc>mn xn--lgbbat1ad8j>dz xn--mgb2ddes>ye "
    "xn--mgb9awbf>om xn--mgba3a4f16a>ir xn--mgbaam7a8h>ae "
    "xn--mgbah1a3hjkrd>mr xn--mgbai9azgqp6j>pk xn--mgbayh7gpa>jo "
    "xn--mgbb7fyab>ly xn--mgbbh1a71e>in xn--mgbbh1a>in xn--mgbc0a9azcg>ma "
    "xn--mgbcpq6gpa1a>bh xn--mgberp4a5d4ar>sa xn--mgbgu82a>in "
    "xn--mgbpl2fh>sd xn--mgbtx2b>iq xn--mgbx4cd0ab>my xn--mix082f>mo "
    "xn--mix891f>mo xn--node>ge xn--o3cw4h>th xn--ogbpf8fl>sy xn--p1ai>ru "
    "xn--pgbs0dh>tn xn--q7ce6a>la xn--qxa6a>eu xn--qxam>gr "
    "xn--rvc1e0am3e>in xn--s9brj9c>in xn--wgbh1c>eg xn--wgbl6a>qa "
    "xn--xkc2al3hye2a>lk xn--xkc2dl3a5ee0h>in xn--y9a3aq>am "
    "xn--yfro4i67o>sg xn--ygbi2ammx>ps ελ>gr ευ>eu бг>bg бел>by ею>eu "
    "мкд>mk мон>mn рф>ru срб>rs укр>ua қаз>kz հայ>am ישראל>il الاردن>jo "
    "البحرين>bh الجزائر>dz السعودية>sa المغرب>ma اليمن>ye امارات>ae "
    "ایران>ir بارت>in بھارت>in تونس>tn سودان>sd سورية>sy عراق>iq عمان>om "
    "فلسطين>ps قطر>qa ليبيا>ly مصر>eg مليسيا>my موريتانيا>mr پاکستان>pk "
    "ڀارت>in भारत>in भारतम्>in भारोत>in বাংলা>bd ভারত>in ভাৰত>in ਭਾਰਤ>in "
    "ભારત>in ଭାରତ>in இந்தியா>in இலங்கை>lk சிங்கப்பூர்>sg భారత్>in ಭಾರತ>in "
    "ഭാരതം>in ලංකා>lk ไทย>th ລາວ>la გე>ge 中国>cn 中國>cn 台湾>tw 台灣>tw 新加坡>sg "
    "澳門>mo 澳门>mo 香港>hk 한국>kr "
)


def tld_first_level_rows() -> list[tuple[str, str]]:
    """(idn_tld, first_level_cc) rows — e.g. ('xn--p1ai', 'ru'),
    ('рф', 'ru'). Mirrors TopLevelDomain.tld_ccs / first_level
    (top_level_domain.py:11, 24-42)."""
    return [
        tuple(tok.split(">", 1))
        for tok in _TLD_CC_FIRST_LEVEL.split()
    ]

# --- 4. MonthlyCrawl registry -----------------------------------------------

# registration-order id runs (crawlstats.py:35-167): run A starts at id 0,
# the 12 historical crawls hold ids 88-99, run B resumes at id 100
_CRAWLS_FROM_0 = (
    "2014-52 2015-06 2015-11 2015-14 2015-18 2015-22 2015-27 2015-32 "
    "2015-35 2015-40 2015-48 2016-07 2016-18 2016-22 2016-26 2016-30 "
    "2016-36 2016-40 2016-44 2016-50 2017-04 2017-09 2017-13 2017-17 "
    "2017-22 2017-26 2017-30 2017-34 2017-39 2017-43 2017-47 2017-51 "
    "2018-05 2018-09 2018-13 2018-17 2018-22 2018-26 2018-30 2018-34 "
    "2018-39 2018-43 2018-47 2018-51 2019-04 2019-09 2019-13 2019-18 "
    "2019-22 2019-26 2019-30 2019-35 2019-39 2019-43 2019-47 2019-51 "
    "2020-05 2020-10 2020-16 2020-24 2020-29 2020-34 2020-40 2020-45 "
    "2020-50 2021-04 2021-10 2021-17 2021-21 2021-25 2021-31 2021-39 "
    "2021-43 2021-49 2022-05 2022-21 2022-27 2022-33 2022-40 2022-49 "
    "2023-06 2023-14 2023-23 2023-40 2023-50 2024-10 2024-18 2024-22 "
)

_CRAWLS_FROM_100 = (
    "2024-26 2024-30 2024-33 2024-38 2024-42 2024-46 2024-51 2025-05 "
    "2025-08 2025-13 2025-18 2025-21 2025-26 2025-30 2025-33 2025-38 "
    "2025-43 2025-47 2025-51 2026-04 2026-08 2026-12 2026-17 2026-21 "
    "2026-25 2026-30 "
)

_HISTORICAL = (
    (88, "CC-MAIN-2008-2009"),
    (89, "CC-MAIN-2009-2010"),
    (90, "CC-MAIN-2012"),
    (91, "CC-MAIN-2013-20"),
    (92, "CC-MAIN-2013-48"),
    (93, "CC-MAIN-2014-10"),
    (94, "CC-MAIN-2014-15"),
    (95, "CC-MAIN-2014-23"),
    (96, "CC-MAIN-2014-35"),
    (97, "CC-MAIN-2014-41"),
    (98, "CC-MAIN-2014-42"),
    (99, "CC-MAIN-2014-49"),
)


def monthly_crawl_registry() -> dict[str, int]:
    """crawl name -> registration id (crawlstats.py by_name, all 126)."""
    reg = {
        f"CC-MAIN-{code}": i
        for i, code in enumerate(_CRAWLS_FROM_0.split())
    }
    reg.update({
        f"CC-MAIN-{code}": 100 + i
        for i, code in enumerate(_CRAWLS_FROM_100.split())
    })
    reg.update({name: i for i, name in _HISTORICAL})
    return reg
